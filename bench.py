"""Benchmark: flagship 3D ViT training throughput (volumes/sec/chip).

Measures the full jitted train step (fwd + bwd + AdamW update) of the
production model — 90^3 volumes, patch 9, 1001 tokens, dim 1024, depth 6,
heads 8 (reference NeuroEncoder.py:181-195) — in bf16 on the default backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); the baseline
divisor is an estimate of the reference PyTorch fp16 pipeline on A100
(~250 volumes/sec: ~270 GFLOP/volume-step at ~35% MXU utilization with eager
materialized attention). vs_baseline > 5 meets the BASELINE.json north star
of >=5x A100 reference throughput per chip.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

A100_REFERENCE_VOLUMES_PER_SEC = 250.0

BATCH = int(__import__("os").environ.get("BENCH_BATCH", "128"))
REMAT = __import__("os").environ.get("BENCH_REMAT", "0") == "1"
WARMUP = 3
ITERS = 10


def main():
    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    config = load_config(overrides={
        "DATASET_NAME": "gradcam",
        "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9,
        "GRADCAM_CUBE_SIZE": 8,
        "TRAINING_DROPOUT": 0.1,
        "TRAINING_PRECISION": "bf16",
        "KERNEL_IMPL": "auto",
        "TRAINING_REMAT": REMAT,
    })
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params = variables["params"]
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    rng = jax.random.key(1, impl="rbg")  # cheap TPU-native dropout bits
    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 90, 90, 90),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, BATCH))

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, rng, x, labels):
        rng, step_rng = jax.random.split(rng)

        def loss_fn(p):
            logits, _ = model.apply(p, x, deterministic=False, rng=step_rng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    for _ in range(WARMUP):
        params, opt_state, rng, loss = train_step(params, opt_state, rng, x, labels)
    float(loss)  # hard sync (block_until_ready alone can lie on the
    #              experimental remote-TPU platform)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, rng, loss = train_step(params, opt_state, rng, x, labels)
    float(loss)
    dt = time.perf_counter() - t0

    volumes_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "adni3d_vit_train_volumes_per_sec_per_chip",
        "value": round(volumes_per_sec, 2),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(volumes_per_sec / A100_REFERENCE_VOLUMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
