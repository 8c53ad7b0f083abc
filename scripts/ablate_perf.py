"""Perf ablations for the flagship train step: where do the ms go?"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurovit_tpu.config import load_config
from neurovit_tpu.models import NeuroEncoder

BATCH = 32


def build(dropout, impl):
    config = load_config(overrides={
        "DATASET_NAME": "gradcam", "TRAINING_VIT_INPUT_SIZE": 90,
        "TRAINING_VIT_PATCH_SIZE": 9, "GRADCAM_CUBE_SIZE" if False else "GRADCAM_CUBE_SIZE": 8,
        "TRAINING_DROPOUT": dropout, "TRAINING_PRECISION": "bf16",
        "KERNEL_IMPL": impl})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    return model, variables["params"]


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # hard sync via value fetch
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 90, 90, 90), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, BATCH))
    rng = jax.random.key(1)

    for impl in ("pallas",):
        for dropout in (0.1, 0.0):
            model, params = build(dropout, impl)
            tx = optax.adamw(1e-4, weight_decay=0.01)
            opt_state = tx.init(params)

            @jax.jit
            def fwd_eval(p, x):
                return model.apply(p, x, deterministic=True)[0]

            @jax.jit
            def fwd_train(p, x, r):
                logits, _ = model.apply(p, x, deterministic=False, rng=r)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()

            @jax.jit
            def grad_only(p, x, r):
                return jax.grad(lambda p: fwd_train(p, x, r))(p)

            @jax.jit
            def full_step(p, o, x, r):
                loss, g = jax.value_and_grad(
                    lambda p: fwd_train(p, x, r))(p)
                u, o = tx.update(g, o, p)
                return optax.apply_updates(p, u), o, loss

            t_eval = timeit(fwd_eval, params, x)
            t_train_fwd = timeit(fwd_train, params, x, rng)
            t_grad = timeit(grad_only, params, x, rng)
            t_full = timeit(full_step, params, opt_state, x, rng)
            print(f"[{impl} dropout={dropout}] eval_fwd {t_eval*1e3:6.1f}ms | "
                  f"train_fwd {t_train_fwd*1e3:6.1f}ms | "
                  f"grad {t_grad*1e3:6.1f}ms | full {t_full*1e3:6.1f}ms | "
                  f"{BATCH/t_full:6.1f} v/s")


if __name__ == "__main__":
    print(jax.devices())
    main()
