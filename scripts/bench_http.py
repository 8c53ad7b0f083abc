"""HTTP serving benchmark: request latency + concurrent-client coalescing.

Measures the online surface (`neurovit_tpu.serving_http`) end-to-end on the
flagship serving shape (90^3, patch 9): an in-process ThreadingHTTPServer
around the bucketed Predictor, driven by real HTTP clients over loopback —
so the numbers include HTTP framing, NIfTI parse, z-score preprocessing,
host->device transfer and the compiled step.

Two measurements:
  1. single-client request latency (median/min over ITERS posts of one
     90^3 volume) — should sit near the b=1 bucket latency from BENCH.md
     "serving latency buckets" plus the host-side parse cost.
  2. N concurrent clients x R requests each — aggregate requests/sec and
     per-request latency. The MicroBatcher coalesces co-arriving volumes
     into shared steps (grouped by shape, routed to the smallest bucket),
     so aggregate throughput should rise with N while per-request latency
     stays near the coalesced-step cost, NOT N x the single-step cost.

Caveat for reading the numbers: this box has ONE host core — the N client
threads, the HTTP handler threads, and the NIfTI parsing all contend for
it, so the concurrent rows understate what a real multi-core serving host
would see. The device-step share is the honest part.

Usage: python scripts/bench_http.py [--int8] [--clients 4 8 16]
Reference surface being beaten: /root/reference/src/Trainer.py:120-166
(offline batch-1 eval sweep; the reference has no online serving at all).
"""

import json
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, ".")

import jax
import numpy as np

ITERS = 20
ROUNDS = 5          # requests per client in the concurrent phase


def _post(url: str, body: bytes) -> dict:
    req = urllib.request.Request(url + "/predict?crop=0", data=body,
                                 method="POST")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def main():
    from neurovit_tpu.config import load_config
    from neurovit_tpu.data import nifti
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.serving import Predictor
    from neurovit_tpu.serving_http import make_server

    config = load_config(overrides={
        "DATASET_NAME": "gradcam",
        "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9,
        "GRADCAM_CUBE_SIZE": 8,
        "TRAINING_DROPOUT": 0.1,        # inert: deterministic forward
        "TRAINING_PRECISION": "bf16",
        "KERNEL_IMPL": "auto",
    })
    quant = "int8" if "--int8" in sys.argv else None
    clients = [int(a) for a in sys.argv[sys.argv.index("--clients") + 1:]
               if a.isdigit()] if "--clients" in sys.argv else [4, 8, 16]

    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    # quant="int8" makes the Predictor quantize the block weights itself.
    # Explicit buckets (vs the power-of-two default) keep warmup to five
    # compiles; 1/8/16/32 cover the single-client and concurrent phases.
    predictor = Predictor(model, variables, batch_size=128, quant=quant,
                          bucket_sizes=(1, 8, 16, 32))
    print(f"buckets {predictor.bucket_sizes} quant {quant or 'bf16'}; "
          "warmup ...")
    predictor.warmup()

    # One serialized 90^3 volume; crop=0 (already model-sized, the server
    # still z-scores). Every client posts this same body.
    vol = np.random.RandomState(0).randn(90, 90, 90).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".nii") as f:
        nifti.save(f.name, vol)
        body = open(f.name, "rb").read()

    server, batcher = make_server(predictor, port=0, window=0.005)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    try:
        # --- 1. single-client latency ---------------------------------
        _post(url, body)                       # route warm
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            _post(url, body)
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "bench": "http_single", "quant": quant or "bf16",
            "ms_median": round(statistics.median(times) * 1e3, 2),
            "ms_min": round(min(times) * 1e3, 2)}))

        # --- 2. concurrent clients ------------------------------------
        for n in clients:
            lat = []
            lat_lock = threading.Lock()
            barrier = threading.Barrier(n)
            errors = []

            def client():
                try:
                    barrier.wait()
                    for _ in range(ROUNDS):
                        t0 = time.perf_counter()
                        _post(url, body)
                        dt = time.perf_counter() - t0
                        with lat_lock:
                            lat.append(dt)
                except Exception as exc:  # surface, don't hang the join
                    errors.append(exc)

            threads = [threading.Thread(target=client) for _ in range(n)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if errors:
                raise errors[0]
            print(json.dumps({
                "bench": "http_concurrent", "clients": n,
                "quant": quant or "bf16",
                "requests": n * ROUNDS,
                "req_per_sec": round(n * ROUNDS / wall, 1),
                "ms_median": round(statistics.median(lat) * 1e3, 2),
                "ms_p95": round(sorted(lat)[int(len(lat) * 0.95)] * 1e3, 2)}))
    finally:
        server.shutdown()
        batcher.stop()


if __name__ == "__main__":
    main()
