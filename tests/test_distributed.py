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
