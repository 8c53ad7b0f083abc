"""ResNet-3D training throughput on the chip (VERDICT #5 / SURVEY §2.0.4).

The Pain-ResNet path (reference README.md:134, resnet_3d.py:26-94) runs the
same 90^3 cropped volumes through ResNet-18-3D. This measures the full jitted
train step (fwd + bwd + BN-state update + AdamW) in bf16 and reports
volumes/sec/chip, giving the §2.0 item-4 "XLA tiles 3D convs well" claim a
number. BENCH_RESNET_DEPTH / BENCH_BATCH override the defaults.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

DEPTH = int(os.environ.get("BENCH_RESNET_DEPTH", "18"))
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
WARMUP, ITERS = 3, 10


def main():
    from neurovit_tpu.config import load_config
    from neurovit_tpu.models import NeuroEncoder

    config = load_config(overrides={
        "DATASET_NAME": "pain",
        "MODEL_VOLUME_ENCODER": "resnet",
        "MODEL_RESNET_DEPTH": DEPTH,
        "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9,
        "TRAINING_PRECISION": "bf16",
    })
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    params, state = variables["params"], variables["state"]
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)
    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 90, 90, 90),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, BATCH))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, x, labels):
        def loss_fn(p):
            logits, aux = model.apply(p, x, state=state, train=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, aux["state"]

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, opt_state,
                loss)

    t0 = time.perf_counter()
    params, state, opt_state, loss = train_step(params, state, opt_state,
                                                x, labels)
    float(loss)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    for _ in range(WARMUP - 1):
        params, state, opt_state, loss = train_step(params, state, opt_state,
                                                    x, labels)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, state, opt_state, loss = train_step(params, state, opt_state,
                                                    x, labels)
    float(loss)
    dt = time.perf_counter() - t0
    print(f"resnet{DEPTH}-3d train: {BATCH * ITERS / dt:.1f} volumes/sec "
          f"({dt / ITERS * 1e3:.1f} ms/step at batch {BATCH}, "
          f"loss {float(loss):.4f})")


if __name__ == "__main__":
    print(jax.devices())
    main()
