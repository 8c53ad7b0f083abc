"""HTTP serving: endpoint round-trips and cross-request micro-batching."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.serving import Predictor, _collect_volume_jobs
from neurovit_tpu.serving_http import MicroBatcher, make_server


def _start(predictor, window=0.005):
    server, batcher = make_server(predictor, port=0, window=window)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, batcher, f"http://127.0.0.1:{server.server_address[1]}"


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_http_predict_matches_batch_pipeline(tiny_config, tmp_path):
    """POST /predict returns the same (timepoint, prediction, probs) rows
    as the batch CLI's preprocessing + Predictor on the same file; /healthz
    reports the bucket metadata; errors map to 400/404."""
    import gzip

    from neurovit_tpu.data import nifti

    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(11))
    predictor = Predictor(model, variables, batch_size=4, bucket_sizes=(1, 2))

    # (21, 39, 21, 2): the default ADNI crop [1:, 10:-9, 1:] yields 20^3,
    # one row per timepoint — same decomposition as the batch CLI.
    path = str(tmp_path / "scan.nii")
    vol4 = np.random.RandomState(5).randn(21, 39, 21, 2).astype(np.float32)
    nifti.save(path, vol4)
    expected_jobs = list(_collect_volume_jobs([path], crop=True))
    exp_labels, exp_probs = predictor(
        np.stack([v for _, _, v in expected_jobs]))

    server, batcher, url = _start(predictor)
    try:
        status, payload = _post(url + "/predict", open(path, "rb").read())
        assert status == 200
        rows = payload["rows"]
        assert [r["timepoint"] for r in rows] == [0, 1]
        assert [r["prediction"] for r in rows] == [int(v) for v in exp_labels]
        np.testing.assert_allclose(
            np.array([r["probs"] for r in rows]), exp_probs, atol=1e-5)

        # Gzipped body: sniffed by magic, no content-type needed.
        status, gz_payload = _post(url + "/predict",
                                   gzip.compress(open(path, "rb").read()))
        assert status == 200
        np.testing.assert_allclose(
            np.array([r["probs"] for r in gz_payload["rows"]]),
            exp_probs, atol=1e-5)

        # crop=0: volumes already at model size skip the ADNI crop (same
        # contract as the batch CLI's --no-crop).
        raw_path = str(tmp_path / "raw.nii")
        raw = np.random.RandomState(7).randn(20, 20, 20).astype(np.float32)
        nifti.save(raw_path, raw)
        status, raw_payload = _post(url + "/predict?crop=0",
                                    open(raw_path, "rb").read())
        assert status == 200
        z = (raw - raw.mean()) / (raw.std() + 1e-8)
        _, want = predictor(z[None])
        np.testing.assert_allclose(raw_payload["rows"][0]["probs"], want[0],
                                   atol=1e-5)

        # crop=0 on a NOT-model-sized volume: the prediction genuinely
        # fails (the compiled ViT has a fixed input size) -> 500, and the
        # server keeps serving afterwards.
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/predict?crop=0", open(path, "rb").read())
        assert err.value.code == 500
        status, _ = _post(url + "/predict", open(path, "rb").read())
        assert status == 200

        with urllib.request.urlopen(url + "/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["buckets"] == [1, 2, 4]
        assert health["is_4d"] is False

        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/predict", b"not a nifti at all")
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/predict", b"")
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/nope", open(path, "rb").read())
        assert err.value.code == 404
    finally:
        server.shutdown()
        batcher.stop()


def test_http_4d_whole_sequences(tiny_config, tmp_path):
    """A 4D checkpoint serves whole [H,W,D,T] sequences over HTTP: one row
    with timepoint -1, matching the batch pipeline's sequence mode."""
    from neurovit_tpu.data import nifti

    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_DROPOUT": 0.0})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(7))
    predictor = Predictor(model, variables, batch_size=2, bucket_sizes=(1,))

    path = str(tmp_path / "seq.nii")
    nifti.save(path, np.random.RandomState(3)
               .randn(21, 39, 21, 3).astype(np.float32))
    expected = list(_collect_volume_jobs([path], crop=True, sequence=True))
    exp_labels, exp_probs = predictor(np.stack([v for _, _, v in expected]))

    server, batcher, url = _start(predictor)
    try:
        status, payload = _post(url + "/predict", open(path, "rb").read())
        assert status == 200
        rows = payload["rows"]
        assert [r["timepoint"] for r in rows] == [-1]
        assert rows[0]["prediction"] == int(exp_labels[0])
        np.testing.assert_allclose(rows[0]["probs"], exp_probs[0], atol=1e-5)
        with urllib.request.urlopen(url + "/healthz") as resp:
            assert json.loads(resp.read())["is_4d"] is True
    finally:
        server.shutdown()
        batcher.stop()


def test_microbatcher_coalesces_concurrent_requests(tiny_config):
    """Volumes enqueued within the window share one compiled step (grouped
    by shape, padded only to the bucket), and results match per-volume
    predictions exactly."""
    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(12))
    predictor = Predictor(model, variables, batch_size=8,
                          bucket_sizes=(1, 2, 4))

    # Record every device call's padded batch (the routing decisions):
    # 5 coalesced volumes ride ONE b=8 step, not five b=1 steps.
    calls = []
    inner = predictor._forward

    def recorder(params, state, volumes):
        calls.append(int(volumes.shape[0]))
        return inner(params, state, volumes)

    predictor._forward = recorder
    batcher = MicroBatcher(predictor, window=0.25)
    try:
        vols = [np.random.RandomState(i).randn(20, 20, 20).astype(np.float32)
                for i in range(5)]
        labels, probs = batcher.predict(vols)
        assert calls == [8]                        # one coalesced step
        solo_labels, solo_probs = predictor(np.stack(vols))
        assert labels == [int(v) for v in solo_labels]
        np.testing.assert_allclose(probs, solo_probs, atol=1e-6)

        # Shape isolation: a volume the model cannot serve (wrong spatial
        # shape for the fixed-size ViT) that lands in the same window must
        # not poison the co-batched good request — groups are per-shape.
        calls.clear()
        results = {}

        def call(key, volume):
            try:
                results[key] = batcher.predict([volume])
            except BaseException as exc:
                results[key] = exc

        bad = np.random.RandomState(9).randn(22, 22, 22).astype(np.float32)
        threads = [threading.Thread(target=call, args=("good", vols[0])),
                   threading.Thread(target=call, args=("bad", bad))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert isinstance(results["bad"], Exception)
        labels2, probs2 = results["good"]
        assert labels2 == [int(solo_labels[0])]
        np.testing.assert_allclose(probs2[0], solo_probs[0], atol=1e-6)
    finally:
        batcher.stop()


def test_http_concurrent_burst_no_resets(tiny_config, tmp_path):
    """A barrier-synced burst of clients (each a fresh TCP connection, the
    HTTP/1.1 one-request-per-connection pattern) all get 200s: the server's
    listen backlog is sized for bursts (socketserver's default of 5 made
    the kernel RESET the overflow under 16 co-arriving clients — measured
    by scripts/bench_http.py on-chip)."""
    from neurovit_tpu.data import nifti

    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(3))
    predictor = Predictor(model, variables, batch_size=16,
                          bucket_sizes=(1, 4, 16))

    path = str(tmp_path / "scan.nii")
    vol = np.random.RandomState(2).randn(21, 39, 21).astype(np.float32)
    nifti.save(path, vol)
    body = open(path, "rb").read()

    server, batcher, url = _start(predictor, window=0.02)
    assert type(server).request_queue_size >= 64
    n = 12
    barrier = threading.Barrier(n)
    results = [None] * n

    def client(i):
        try:
            barrier.wait()
            results[i] = _post(url + "/predict", body)
        except BaseException as exc:
            results[i] = exc

    try:
        _post(url + "/predict", body)              # route warm
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        bad = [r for r in results if not isinstance(r, tuple)]
        assert not bad, f"burst requests failed: {bad[:3]}"
        first = results[0][1]["rows"][0]["probs"]
        for status, payload in results:
            assert status == 200
            np.testing.assert_allclose(payload["rows"][0]["probs"], first,
                                       atol=1e-6)
    finally:
        server.shutdown()
        batcher.stop()


def test_http_mesh_serving_matches_single_device(tiny_config, tmp_path):
    """`--mesh` on the HTTP server (shared `predictor_from_cli_args`
    plumbing with the batch CLI): coalesced steps shard over the mesh data
    axis and return the single-device probabilities."""
    import argparse

    from neurovit_tpu.data import nifti
    from neurovit_tpu.serving import predictor_from_cli_args
    from neurovit_tpu.training import state_dict as sd

    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(21))
    ckpt = str(tmp_path / "model.pkl")
    sd.save(ckpt, sd.to_state_dict(model, variables["params"]))

    parser = argparse.ArgumentParser()
    args = argparse.Namespace(checkpoint=ckpt, buckets="", batch_size=8,
                              quant=None, host_bf16=False, mesh=True)
    predictor = predictor_from_cli_args(parser, args, tiny_config)
    assert predictor.mesh is not None
    assert predictor.batch_size == 8

    path = str(tmp_path / "scan.nii")
    vol4 = np.random.RandomState(17).randn(21, 39, 21, 3).astype(np.float32)
    nifti.save(path, vol4)
    solo = Predictor.from_checkpoint(tiny_config, ckpt, batch_size=8,
                                     bucket_sizes=())
    exp_labels, exp_probs = solo(
        np.stack([v for _, _, v in _collect_volume_jobs([path], crop=True)]))

    server, batcher, url = _start(predictor)
    try:
        status, payload = _post(url + "/predict", open(path, "rb").read())
        assert status == 200
        rows = payload["rows"]
        assert [r["prediction"] for r in rows] == [int(v) for v in exp_labels]
        np.testing.assert_allclose(
            np.array([r["probs"] for r in rows]), exp_probs, atol=1e-5)
    finally:
        server.shutdown()
        batcher.stop()


def test_microbatcher_propagates_prediction_errors(tiny_config):
    """A failing step errors every caller in the group instead of hanging
    them (the Event is set on the error path too)."""
    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(13))
    predictor = Predictor(model, variables, batch_size=4, bucket_sizes=())

    def exploding(params, state, volumes):
        raise RuntimeError("device fell over")

    predictor._forward = exploding
    batcher = MicroBatcher(predictor, window=0.05)
    try:
        vol = np.zeros((20, 20, 20), np.float32)
        with pytest.raises(RuntimeError, match="device fell over"):
            batcher.predict([vol, vol])
    finally:
        batcher.stop()
