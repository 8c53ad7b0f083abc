"""Multi-host initialization layer: gating + single-process batch assembly."""

import numpy as np

import jax

from neurovit_tpu.parallel import create_mesh, distributed


def test_multihost_not_requested_by_default(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert not distributed.multihost_requested({})
    assert not distributed.multihost_requested(None)
    # maybe_initialize is a strict no-op then (this process must stay
    # single-host: calling jax.distributed.initialize here would hang).
    assert distributed.maybe_initialize({}) is False


def test_multihost_requested_via_config_or_env(monkeypatch):
    assert distributed.multihost_requested({"DISTRIBUTED_MULTIHOST": True})
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert distributed.multihost_requested({})


def test_global_batch_single_process_matches_shard_batch():
    mesh = create_mesh()
    host = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = distributed.global_batch(host, mesh)
    assert arr.shape == (16, 4)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), host)
    # Batch dim sharded over the data axis: each shard holds 2 rows.
    assert arr.addressable_shards[0].data.shape[0] == 2


def test_shard_batch_routes_local_data_when_multiprocess(monkeypatch):
    """On a multi-process mesh, shard_batch must assemble the global array
    from process-local rows (make_array_from_process_local_data), never
    device_put the local batch as if it were the global one; replicated
    (4D) placement must refuse rather than silently diverge across hosts."""
    import pytest

    from neurovit_tpu.parallel import shard_batch

    mesh = create_mesh()
    host = {"volume": np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
            "label": np.zeros(16, np.int32), "subject": ["s"] * 16}

    calls = []
    real = jax.make_array_from_process_local_data

    def spy(sharding, value, *a, **k):
        calls.append(value.shape)
        return real(sharding, value, *a, **k)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", spy)
    out = shard_batch(host, mesh)
    # Both array fields went through the process-local assembly path; in
    # this actually-single-process test the result equals the host batch.
    assert calls == [(16, 4), (16,)]
    np.testing.assert_array_equal(np.asarray(out["volume"]), host["volume"])
    assert out["subject"] == host["subject"]

    with pytest.raises(NotImplementedError, match="multi-process"):
        shard_batch(host, mesh, replicate=True)
