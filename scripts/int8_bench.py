"""Go/no-go data for an int8 quantized serving path.

Measures, at the serving-forward matmul shapes (batch 64 of the flagship:
M = B*N = 64*1024 tokens), on the real chip:

  1. bf16 matmul (the current serving path's currency),
  2. pure int8 x int8 -> int32 matmul (can XLA reach the MXU int8 rate?),
  3. the full dynamic-quant composition bf16 -> per-row quantize -> int8
     dot -> dequantize (what a drop-in quantized Linear actually costs).

v5e peak: 197 TF/s bf16, 394 TOP/s int8. If (2)/(3) don't clearly beat
(1), the quantized path is a no-go (record and move on).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def bench_shape(M, K, N, tag):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N) * 0.02, jnp.bfloat16)
    xi8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    wi8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    w_scale = jnp.asarray(np.abs(rng.randn(N)) * 0.01, jnp.float32)
    flops = 2 * M * K * N

    @jax.jit
    def mm_bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    @jax.jit
    def mm_int8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @jax.jit
    def mm_dynquant(x, wi8, w_scale):
        # per-row symmetric activation quant + int8 dot + dequant epilogue
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                         keepdims=True)
        s_x = jnp.maximum(absmax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wi8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * s_x * w_scale[None, :]

    t = timeit(mm_bf16, x, w)
    print(f"{tag} bf16     : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")
    t = timeit(mm_int8, xi8, wi8)
    print(f"{tag} int8     : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s")
    t = timeit(mm_dynquant, x, wi8, w_scale)
    print(f"{tag} dynquant : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s "
          f"(incl. quant+dequant)")


def bench_chain(M, K, N, tag, reps=8):
    """Dispatch-free variant: `reps` distinct matmuls chained in ONE jit
    via lax.scan (single device sync) — isolates device compute from the
    tunneled per-call latency of this box."""
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(reps, M, K), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N) * 0.02, jnp.bfloat16)
    xi8 = jnp.asarray(rng.randint(-127, 128, (reps, M, K)), jnp.int8)
    wi8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    flops = reps * 2 * M * K * N

    @jax.jit
    def chain_bf16(xs, w):
        def body(acc, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return acc + jnp.sum(y), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    @jax.jit
    def chain_int8(xs, w):
        def body(acc, x):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + jnp.sum(y), None
        return jax.lax.scan(body, jnp.int32(0), xs)[0]

    w_scale = jnp.asarray(np.abs(rng.randn(N)) * 0.01, jnp.float32)

    @jax.jit
    def chain_dynquant(xs, w, w_scale):
        def body(acc, x):
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                             keepdims=True)
            s = jnp.maximum(absmax, 1e-12) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # full dequant epilogue (per-row act scale x per-col weight
            # scale) — same cost as the drop-in quantized Linear.
            return acc + jnp.sum(y.astype(jnp.float32) * s
                                 * w_scale[None, :]), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    t = timeit(chain_bf16, xs, w, iters=10)
    print(f"{tag} chain bf16     : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")
    t = timeit(chain_int8, xi8, wi8, iters=10)
    print(f"{tag} chain int8     : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s")
    t = timeit(chain_dynquant, xs, wi8, w_scale, iters=10)
    print(f"{tag} chain dynquant : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s")


def main():
    print(jax.devices())
    # health check: trivial jit (tunnel degradation tripwire)
    t0 = time.perf_counter()
    float(jax.jit(lambda a: a + 1)(jnp.ones(())))
    print(f"health: trivial jit {time.perf_counter() - t0:.1f}s")

    if "--chain" in sys.argv:
        # Square diagnostic: can XLA reach the 2x int8 MXU rate at all?
        bench_chain(4096, 4096, 4096, "sq4k  [4096,4096]x[4096,4096]")
        bench_chain(8192, 1024, 2048, "fc1   [ 8192,1024]x[1024,2048]")
        bench_chain(8192, 2048, 1024, "fc2   [ 8192,2048]x[2048,1024]")
        bench_chain(8192, 1024, 1536, "qkv   [ 8192,1024]x[1024,1536]")
        return

    M = 64 * 1024
    bench_shape(M, 1024, 2048, "fc1   [65536,1024]x[1024,2048]")
    bench_shape(M, 2048, 1024, "fc2   [65536,2048]x[2048,1024]")
    bench_shape(M, 1024, 1536, "qkv   [65536,1024]x[1024,1536]")
    bench_shape(M, 512, 1024, "out   [65536, 512]x[ 512,1024]")


if __name__ == "__main__":
    main()
