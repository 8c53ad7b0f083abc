"""Can Mosaic reach the int8 MXU rate where XLA cannot?

BENCH.md "int8 quantized serving": XLA's int8 dot_general is a strategy
lottery at the flagship serving shapes (the same GEMM compiled to 4.9-28.4
ms across runs) and never approached the nominal 2x int8 MXU rate; the
go/no-go verdict was NO, "revisit only with a hand-written Pallas int8
kernel AND evidence Mosaic reaches the int8 MXU rate".  This script is
that evidence probe: the SAME blocked Pallas matmul, once with int8
operands (int32 accumulate) and once with bf16 (f32 accumulate), at the
flagship serving GEMM shapes + a square diagnostic.  If int8/bf16 < ~1.5x
here, post-training int8 serving stays off the table on this part.

Usage: python scripts/int8_pallas_bench.py [--quick]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, o_ref, acc_dtype):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=acc_dtype)


def blocked_matmul(a, b, *, bm=256, bn=256, acc_dtype):
    m, k = a.shape
    k2, n = b.shape
    bm, bn = min(bm, m), min(bn, n)    # narrow attention shapes (n=64)
    assert k == k2 and m % bm == 0 and n % bn == 0
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        grid=(m // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, bn), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(a, b)


def _dq_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref):
    acc = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32)
                  * sa_ref[...] * sb_ref[...]).astype(jnp.bfloat16)


def dynquant_matmul(a_i8, b_i8, sa, sb, *, bm=256, bn=256):
    """int8 GEMM with the full serving epilogue: per-row x per-col dequant
    to bf16 (the realistic cost, not just the raw int8 rate)."""
    m, k = a_i8.shape
    _, n = b_i8.shape
    bm, bn = min(bm, m), min(bn, n)
    return pl.pallas_call(
        _dq_kernel,
        grid=(m // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, bn), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(a_i8, b_i8, sa, sb)


def _chained(fn, reps):
    """`reps` matmuls over distinct A slices in ONE jit (lax.scan body =
    one pallas_call).  A single scalar fetch syncs the whole chain, so the
    ~30-35 ms tunnel RTT of this box is paid once per chain, not per GEMM."""
    @jax.jit
    def run(a_stack, *rest):
        def body(acc, a):
            o = fn(a, *rest)
            return acc + o[0, 0].astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), a_stack)[0]
    return run


def timeit(fn, a, *rest, iters=8, reps_hi=96, reps_lo=8):
    """Per-GEMM seconds via a two-point chain-length fit: the difference
    t(reps_hi) - t(reps_lo) cancels the constant per-call RTT + sync cost
    that swamped the naive per-call timing (each GEMM here is < 1 ms; the
    tunnel round trip is ~35 ms with tens-of-ms jitter — hence min-of-iters
    at each point and an 88-GEMM spread to keep the delta above the noise)."""
    ts = {}
    for reps in (reps_lo, reps_hi):
        stack = jnp.broadcast_to(a, (reps,) + a.shape)
        run = _chained(fn, reps)
        _ = float(run(stack, *rest))          # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            _ = float(run(stack, *rest))
            best = min(best, time.time() - t0)
        ts[reps] = best
    return max(ts[reps_hi] - ts[reps_lo], 1e-9) / (reps_hi - reps_lo)


# Flagship serving GEMMs (b64 serving: M = 64*1352 tokens row-blocked) +
# the square diagnostic where XLA's int8 showed its only consistent win.
# Round-4 go/no-go additions (VERDICT r3 #5): the remaining bf16 serving
# components — attention QK^T/PV at the d_head=64 shape floor
# (reference vit_3d.py:53-58) and the patch-embed GEMM (patch 9 -> K=729,
# measured at the 768 lane-aligned proxy Mosaic would pad to anyway).
SHAPES = [("fc1", 8192, 1024, 2048),
          ("fc2", 8192, 2048, 1024),
          ("qkv", 8192, 1024, 1536),
          ("attn_qk", 8192, 64, 1024),
          ("attn_pv", 8192, 1024, 64),
          ("patch_embed", 8192, 768, 1024),
          ("square4k", 4096, 4096, 4096)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    shapes = SHAPES[:1] + SHAPES[-1:] if args.quick else SHAPES

    for name, m, k, n in shapes:
        a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        bbf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        sa = jnp.asarray(rng.random((m, 1)) + 0.5, jnp.float32)
        sb = jnp.asarray(rng.random((1, n)) + 0.5, jnp.float32)
        flops = 2.0 * m * k * n

        t_bf = timeit(lambda x, y: blocked_matmul(
            x, y, acc_dtype=jnp.float32), abf, bbf)
        t_i8 = timeit(lambda x, y: blocked_matmul(
            x, y, acc_dtype=jnp.int32), a8, b8)
        t_dq = timeit(dynquant_matmul, a8, b8, sa, sb)
        print(f"{name:9s} bf16 {t_bf*1e3:7.2f} ms ({flops/t_bf/1e12:6.1f} "
              f"TF/s) | int8 {t_i8*1e3:7.2f} ms ({flops/t_i8/1e12:6.1f} "
              f"TOP/s) | dynquant {t_dq*1e3:7.2f} ms "
              f"({flops/t_dq/1e12:6.1f} TOP/s) | int8/bf16 "
              f"{t_bf/t_i8:4.2f}x dq/bf16 {t_bf/t_dq:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
