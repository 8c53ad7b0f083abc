"""Serving-forward throughput sweep: volumes/sec/chip vs batch size.

Device-resident deterministic forward + softmax (the Predictor's compiled
program, serving.py:53-58) on the flagship model. The training sweet spot
is batch 128; serving has no optimizer/backward memory so larger batches
may amortize better — this sweep finds the serving sweet spot.

``--latency [n ...]``: end-to-end REQUEST latency through the real
Predictor (host numpy in -> probs out, including the host->device
transfer) for small request sizes, bucketed vs the single-compiled-shape
round-4 behavior — the measurement behind BENCH.md "serving latency
buckets". Compose with --int8 / --host-bf16.
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

WARMUP = 3
ITERS = 10


def latency(config, argv):
    """Median end-to-end request latency: bucketed vs single-shape."""
    from neurovit_tpu.serving import Predictor
    from neurovit_tpu.models import NeuroEncoder

    quant = "int8" if "--int8" in argv else None
    host = "bf16" if "--host-bf16" in argv else None
    sizes = [int(a) for a in argv if not a.startswith("--")] or [1, 2, 8, 32]
    batch = 128

    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    vols = rng.randn(max(sizes), 90, 90, 90).astype(np.float32)

    for label, buckets in (("single-shape (r4)", ()), ("bucketed", None)):
        p = Predictor(model, variables, batch_size=batch, quant=quant,
                      host_transfer_dtype=host, bucket_sizes=buckets)
        p.warmup()
        for n in sizes:
            req = vols[:n]
            p(req)                                   # route warm
            times = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                p(req)                               # np out = hard sync
                times.append(time.perf_counter() - t0)
            print(json.dumps({
                "mode": label, "request_n": n, "quant": quant or "bf16",
                "host_transfer": host or "f32",
                "buckets": list(p.bucket_sizes),
                "ms_median": round(statistics.median(times) * 1e3, 2),
                "ms_min": round(min(times) * 1e3, 2)}))


def main():
    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    config = load_config(overrides={
        "DATASET_NAME": "gradcam",
        "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9,
        "GRADCAM_CUBE_SIZE": 8,
        "TRAINING_DROPOUT": 0.1,        # inert: deterministic forward
        "TRAINING_PRECISION": "bf16",
        "KERNEL_IMPL": "auto",
    })
    if "--latency" in sys.argv:
        sys.argv.remove("--latency")
        latency(config, sys.argv[1:])
        return

    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params, state = variables["params"], variables.get("state")

    quant = None
    if "--int8" in sys.argv:
        # Post-training int8 (serving.Predictor(quant="int8") path): the
        # block GEMMs run on the int8 MXU via ops/int8_serving kernels.
        sys.argv.remove("--int8")
        from neurovit_tpu.ops import int8_serving
        ve = dict(params["volume_encoder"])
        ve["blocks"] = int8_serving.quantize_blocks(ve["blocks"])
        params = {**params, "volume_encoder": ve}
        quant = "int8"
        print("mode: int8 block GEMMs")

    @jax.jit
    def forward(params, state, volumes):
        logits, _ = model.apply(params, volumes, state=state,
                                deterministic=True)
        return jax.nn.softmax(logits, axis=-1)

    # health check first: this box's TPU tunnel degrades sporadically.
    t0 = time.perf_counter()
    float(jax.jit(lambda a: a + 1)(jnp.ones(())))
    print(f"health: trivial jit {time.perf_counter() - t0:.1f}s")

    batches = [int(b) for b in
               (sys.argv[1:] or ["64", "128", "192", "256"])]
    for batch in batches:
        x = jnp.asarray(np.random.RandomState(0).randn(batch, 90, 90, 90),
                        jnp.float32)
        try:
            probs = forward(params, state, x)
            float(probs[0, 0])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                probs = forward(params, state, x)
            float(probs[0, 0])
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM etc.
            print(f"batch {batch:4d}: FAILED ({type(e).__name__})")
            continue
        vps = batch * ITERS / dt
        print(json.dumps({"batch": batch, "quant": quant or "bf16",
                          "ms_per_batch": round(dt / ITERS * 1e3, 1),
                          "volumes_per_sec": round(vps, 1)}))


if __name__ == "__main__":
    main()
