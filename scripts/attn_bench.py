"""Attention kernel shoot-out: ours vs jax library pallas flash (fwd+bwd)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, H, N, D = 32, 8, 1024, 64
FLOPS_FWD = 4 * B * H * N * N * D


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    q, k, v = [jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
               for _ in range(3)]
    scale = D ** -0.5

    from neurovit_tpu.ops.flash_attention import flash_attention as ours

    @jax.jit
    def ours_fwd(q, k, v):
        return ours(q, k, v, scale=scale)

    @jax.jit
    def ours_grad(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            ours(q, k, v, scale=scale).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)

    t = timeit(ours_fwd, q, k, v)
    print(f"ours  fwd : {t*1e3:6.2f}ms  {FLOPS_FWD/t/1e12:6.1f} TF/s")
    t = timeit(ours_grad, q, k, v)
    print(f"ours  f+b : {t*1e3:6.2f}ms")

    # bnhd layout (all-heads-per-program kernel, what the fused attention
    # path feeds) on the same problem.
    qn, kn, vn = (jnp.asarray(np.asarray(x.transpose(0, 2, 1, 3)))
                  for x in (q, k, v))

    @jax.jit
    def bnhd_fwd(q, k, v):
        return ours(q, k, v, scale=scale, layout="bnhd")

    @jax.jit
    def bnhd_grad(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            ours(q, k, v, scale=scale, layout="bnhd").astype(jnp.float32)
            ** 2), argnums=(0, 1, 2))(q, k, v)

    t = timeit(bnhd_fwd, qn, kn, vn)
    print(f"bnhd  fwd : {t*1e3:6.2f}ms  {FLOPS_FWD/t/1e12:6.1f} TF/s")
    t = timeit(bnhd_grad, qn, kn, vn)
    print(f"bnhd  f+b : {t*1e3:6.2f}ms")

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as lib)

    @jax.jit
    def lib_fwd(q, k, v):
        return lib(q, k, v, sm_scale=scale)

    @jax.jit
    def lib_grad(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            lib(q, k, v, sm_scale=scale).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)

    t = timeit(lib_fwd, q, k, v)
    print(f"lib   fwd : {t*1e3:6.2f}ms  {FLOPS_FWD/t/1e12:6.1f} TF/s")
    t = timeit(lib_grad, q, k, v)
    print(f"lib   f+b : {t*1e3:6.2f}ms")

    # numerics cross-check
    o1 = ours_fwd(q, k, v).astype(jnp.float32)
    o2 = lib_fwd(q, k, v).astype(jnp.float32)
    print("max |ours-lib| =", float(jnp.max(jnp.abs(o1 - o2))))


if __name__ == "__main__":
    print(jax.devices())
    main()
