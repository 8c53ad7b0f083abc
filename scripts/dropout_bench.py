"""Isolated dropout benchmark: pallas kernel vs XLA mask paths (fwd+bwd)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

M, C = 32 * 1001, 2048


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(M, C), jnp.bfloat16)

    from neurovit_tpu.ops import dropout as fused

    key = jax.random.key(0)

    @jax.jit
    def pallas_fwd(x):
        return fused.dropout(key, x, 0.1)

    @jax.jit
    def pallas_grad(x):
        return jax.grad(lambda x: jnp.sum(
            fused.dropout(key, x, 0.1).astype(jnp.float32) ** 2))(x)

    print(f"pallas fwd : {timeit(pallas_fwd, x)*1e3:6.2f}ms")
    print(f"pallas grad: {timeit(pallas_grad, x)*1e3:6.2f}ms")
    # sanity: keep fraction
    kept = float(jnp.mean((pallas_fwd(x) != 0).astype(jnp.float32)))
    print(f"keep fraction {kept:.4f}")

    for impl in ("threefry2x32", "rbg"):
        k = jax.random.key(0, impl=impl)

        @jax.jit
        def xla_fwd(x, k):
            mask = jax.random.bernoulli(k, 0.9, x.shape)
            return jnp.where(mask, x / 0.9, 0).astype(x.dtype)

        @jax.jit
        def xla_grad(x, k):
            return jax.grad(lambda x: jnp.sum(
                xla_fwd(x, k).astype(jnp.float32) ** 2))(x)

        print(f"xla[{impl:12s}] fwd : {timeit(xla_fwd, x, k)*1e3:6.2f}ms")
        print(f"xla[{impl:12s}] grad: {timeit(xla_grad, x, k)*1e3:6.2f}ms")


if __name__ == "__main__":
    print(jax.devices())
    main()
