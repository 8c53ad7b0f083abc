"""Fused multi-head attention Pallas TPU kernel with custom VJP.

Replaces the reference's eager attention (materialized softmax(QK^T)V with
N x N probabilities round-tripping HBM, ``src/models/vit_3d.py:53-58``) with
a VMEM-resident fused kernel tuned for this framework's sequence regime
(N ~ 1000 tokens for the 3D ViT, N = T ~ 140 for the temporal head):

- grid over (batch x heads); K/V for the whole sequence stay resident in
  VMEM (N<=2048, D=64 -> <=1 MB each); Q is processed in row blocks,
- per Q block the full score row (block_q x N) lives in VMEM: exact one-pass
  softmax (no online-softmax rescaling needed), masked for padded keys,
- attention-probability dropout (vit_3d.py:56-57 semantics) generated
  *inside* the kernel with the TPU PRNG; the backward pass regenerates the
  identical mask from the same per-(head, q-block) seed instead of storing an
  N x N mask,
- custom VJP: backward recomputes P from Q/K (flash-style rematerialization;
  only O's cotangent and the inputs are read from HBM) and accumulates
  dK/dV across Q blocks in VMEM scratch,
- all matmuls hit the MXU with f32 accumulation; HBM traffic is only
  Q, K, V, O and their gradients — the N x N matrix never leaves the chip.

Inputs [B, H, N, D]; caller-visible N is padded here to the TPU lane size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128          # TPU lane width; pad N to a multiple
MAX_RESIDENT_N = 4096   # above this, fall back to the XLA path
LOG2E = 1.4426950408889634  # softmax via exp2 (cheaper on the VPU)
# Score clamp (exp2 domain) replacing the row-max subtraction: one fused
# clip instead of a max-reduce + subtract pass over the [block_q, N] scores.
# Exact for |s| <= 96 (~66 nats — far beyond trained attention logits, which
# sit within ~+-15 nats); beyond it the clamp degrades gracefully (saturated
# rows stay saturated, uniformly tiny rows become uniform) instead of
# overflowing: 2^96 * N < f32/bf16 max, and N * 2^-96 stays normal.
SCORE_CAP = 96.0


def _block_q(n_pad: int, is_bwd: bool = False) -> int:
    """Largest Q block that divides n_pad (a LANE multiple) within VMEM.
    Bigger blocks amortize K/V reuse and VPU softmax setup. Forward fits the
    whole sequence (scores <= 1024x2048 f32 = 8 MB); backward holds extra
    f32 intermediates (p, dp, ds) so it caps at 512."""
    for b in ((512,) if is_bwd else (1024, 512)):
        if n_pad % b == 0 and b <= n_pad:
            return b
    for b in (256, LANE):
        if n_pad % b == 0:
            return b
    return LANE


def _quantized_keep(keep: float) -> float:
    """Keep probability quantized to q/256 — matches nn.dropout and lets the
    mask use one random byte per element (4x fewer PRNG words)."""
    q = int(round(keep * 256.0))
    return q / 256.0 if 0 < q < 256 else keep


def _dropout_mask(shape, keep: float):
    """Bernoulli(keep) {0,1} mask from the seeded per-core PRNG.

    Draws (m//4, n) uint32 words and bitcasts to (m, n) uint8 (the bitcast
    expands the sublane dim): PRNG generation volume is the dominant dropout
    cost, and one byte per element is plenty for a keep threshold. The keep
    probability is quantized to q/256 with the inverse scale corrected by the
    caller via _quantized_keep, so the mask stays unbiased."""
    m, n = shape
    q = int(round(keep * 256.0))
    if 0 < q < 256 and m % 4 == 0:
        bits = pltpu.bitcast(pltpu.prng_random_bits((m // 4, n)), jnp.uint8)
        return (bits.astype(jnp.int32) < q).astype(jnp.float32)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(keep * 4294967295.0))
    return (pltpu.bitcast(bits, jnp.uint32) < threshold).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                scale: float, n_valid: int, dropout_rate: float):
    # Refs are squeezed [n_pad, d] blocks — the (batch, head) dims are
    # selected by the BlockSpec index map, which is what lets the same
    # kernel serve both the bhnd and bnhd storage layouts.
    n_pad = q_ref.shape[0]
    d = q_ref.shape[1]
    # With dropout the backward regenerates the per-(program, q-block) mask,
    # so fwd/bwd MUST tile Q identically; deterministic forwards (eval,
    # serving) use the larger whole-sequence block.
    block_q = _block_q(n_pad, is_bwd=dropout_rate > 0.0)
    n_blocks = n_pad // block_q
    keep = _quantized_keep(1.0 - dropout_rate)

    # Keep operands in their storage dtype (bf16): the MXU accumulates in
    # f32 via preferred_element_type, and bf16 passes are ~8x faster than
    # upcast-f32 matmuls.
    k = k_ref[...]
    v = v_ref[...]

    # Static key-padding mask (shapes are static under jit), applied as a
    # multiply AFTER exp2 so it fuses into the same elementwise pass — no
    # NEG_INF select pass, and exact zeros for padded keys. Skipped entirely
    # when the sequence is unpadded (serving / lane-aligned shapes).
    if n_valid < n_pad:
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 1)
        pad_maskf = (kv_ids < n_valid).astype(jnp.float32)

    def body(qb, _):
        q = q_ref[pl.ds(qb * block_q, block_q), :]
        # exp2-softmax with deferred normalization: the row divide happens on
        # the [block_q, D] output instead of the [block_q, N] probabilities,
        # and the SCORE_CAP clip replaces the row-max subtraction.
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E)
        p = jnp.exp2(jnp.clip(s, -SCORE_CAP, SCORE_CAP))
        if n_valid < n_pad:
            p = p * pad_maskf
        denom = jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
            pltpu.prng_seed(seed_ref[0, 0] + pid * n_blocks + qb)
            # 1/keep is folded into the row denominator (D-wide, not N-wide).
            p = p * _dropout_mask((block_q, n_pad), keep)
            denom = denom * keep
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o = o / denom
        o_ref[pl.ds(qb * block_q, block_q), :] = o.astype(o_ref.dtype)
        return ()

    # Static unroll: n_blocks is tiny (1-2) and unrolling lets Mosaic overlap
    # block i+1's QK^T on the MXU with block i's softmax on the VPU.
    for qb in range(n_blocks):
        body(qb, ())


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale: float, n_valid: int, dropout_rate: float):
    n_pad = q_ref.shape[0]
    block_q = _block_q(n_pad, is_bwd=True)
    n_blocks = n_pad // block_q
    keep = _quantized_keep(1.0 - dropout_rate)

    k = k_ref[...]
    v = v_ref[...]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    if n_valid < n_pad:
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 1)
        pad_maskf = (kv_ids < n_valid).astype(jnp.float32)

    def body(qb, _):
        q = q_ref[pl.ds(qb * block_q, block_q), :]
        do = do_ref[pl.ds(qb * block_q, block_q), :]

        # Rematerialize P exactly as the forward did (bf16 in, f32 accum,
        # exp2 + SCORE_CAP clip, post-exp2 pad mask — skipped entirely for
        # lane-aligned sequences, matching the forward).
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E)
        p = jnp.exp2(jnp.clip(s, -SCORE_CAP, SCORE_CAP))
        if n_valid < n_pad:
            p = p * pad_maskf
        p = p / jnp.sum(p, axis=1, keepdims=True)

        if dropout_rate > 0.0:
            pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
            pltpu.prng_seed(seed_ref[0, 0] + pid * n_blocks + qb)
            mask = _dropout_mask((block_q, n_pad), keep)
            # 1/keep is folded into the scalar epilogues below (dv_ref
            # scaling and ds's scale constant) instead of N-wide multiplies.
            p_m = p * mask
        else:
            p_m = p

        # dV += P_m^T dO        (contract over q rows; bf16 in, f32 accum);
        # the 1/keep dropout scale lands once on dv_ref at the end.
        dv_acc[...] += jax.lax.dot_general(
            p_m.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = dO V^T ; chain through dropout, then the softmax jacobian.
        # With dp_m = dP*mask and delta' = sum(p*dp_m):
        #   ds = p*(dp_m/keep - delta'/keep)*scale = p*(dp_m - delta')*(scale/keep)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_m = dp * mask if dropout_rate > 0.0 else dp
        delta = jnp.sum(p * dp_m, axis=1, keepdims=True)
        ds = (p * (dp_m - delta) * (scale / keep)).astype(q.dtype)
        # dQ block = dS K
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dq_ref[pl.ds(qb * block_q, block_q), :] = dq.astype(dq_ref.dtype)
        # dK += dS^T Q
        dk_acc[...] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ()

    for qb in range(n_blocks):
        body(qb, ())
    dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[...] = (dv_acc[...] * (1.0 / keep)).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# All-heads kernels (bnhd layout)
# ---------------------------------------------------------------------------
# [B, N, H, D] blocks cannot be sliced per-head by the BlockSpec (the last
# two block dims must tile the array), so the bnhd path runs one program per
# batch element: the full [n_pad, H, D] slab DMAs contiguously into VMEM
# (~1 MB per operand at the ViT shapes) and a static head loop reuses the
# exact per-head math of the bhnd kernels via in-VMEM slices.

def _fwd_kernel_allheads(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                         scale: float, n_valid: int, dropout_rate: float,
                         n_heads: int):
    n_pad, hd = q_ref.shape
    d = hd // n_heads
    block_q = _block_q(n_pad, is_bwd=dropout_rate > 0.0)
    n_blocks = n_pad // block_q
    keep = _quantized_keep(1.0 - dropout_rate)

    if n_valid < n_pad:
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 1)
        pad_maskf = (kv_ids < n_valid).astype(jnp.float32)

    for h in range(n_heads):
        k = k_ref[:, pl.ds(h * d, d)]
        v = v_ref[:, pl.ds(h * d, d)]
        for qb in range(n_blocks):
            q = q_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E)
            p = jnp.exp2(jnp.clip(s, -SCORE_CAP, SCORE_CAP))
            if n_valid < n_pad:
                p = p * pad_maskf
            denom = jnp.sum(p, axis=1, keepdims=True)
            if dropout_rate > 0.0:
                pid = pl.program_id(0) * n_heads + h
                pltpu.prng_seed(seed_ref[0, 0] + pid * n_blocks + qb)
                p = p * _dropout_mask((block_q, n_pad), keep)
                denom = denom * keep
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)] = (
                (o / denom).astype(o_ref.dtype))


def _bwd_kernel_allheads(seed_ref, q_ref, k_ref, v_ref, do_ref,
                         dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                         scale: float, n_valid: int, dropout_rate: float,
                         n_heads: int):
    n_pad, hd = q_ref.shape
    d = hd // n_heads
    block_q = _block_q(n_pad, is_bwd=True)
    n_blocks = n_pad // block_q
    keep = _quantized_keep(1.0 - dropout_rate)

    if n_valid < n_pad:
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 1)
        pad_maskf = (kv_ids < n_valid).astype(jnp.float32)

    for h in range(n_heads):
        k = k_ref[:, pl.ds(h * d, d)]
        v = v_ref[:, pl.ds(h * d, d)]
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)
        for qb in range(n_blocks):
            q = q_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)]
            do = do_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E)
            p = jnp.exp2(jnp.clip(s, -SCORE_CAP, SCORE_CAP))
            if n_valid < n_pad:
                p = p * pad_maskf
            p = p / jnp.sum(p, axis=1, keepdims=True)
            if dropout_rate > 0.0:
                pid = pl.program_id(0) * n_heads + h
                pltpu.prng_seed(seed_ref[0, 0] + pid * n_blocks + qb)
                mask = _dropout_mask((block_q, n_pad), keep)
                p_m = p * mask
            else:
                p_m = p
            dv_acc[...] += jax.lax.dot_general(
                p_m.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp_m = dp * mask if dropout_rate > 0.0 else dp
            delta = jnp.sum(p * dp_m, axis=1, keepdims=True)
            ds = (p * (dp_m - delta) * (scale / keep)).astype(q.dtype)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dq_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)] = (
                dq.astype(dq_ref.dtype))
            dk_acc[...] += jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dk_ref[:, pl.ds(h * d, d)] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[:, pl.ds(h * d, d)] = (dv_acc[...] * (1.0 / keep)
                                      ).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _bh_specs(layout: str, h: int, n_pad: int, d: int, count: int):
    """Per-(batch, head) full-sequence VMEM blocks, squeezed to [n_pad, d].

    layout "bhnd": arrays are [B, H, N, D] (grid index i -> (i//h, i%h));
    layout "bnhd": arrays are [B, N, H, D] — the storage the fused LN+QKV
    kernel emits and the out-projection consumes, so no head transpose ever
    materializes. The DMA per (b, h) program is then N rows of D contiguous
    elements (stride H*D); attention is compute-bound at these shapes, so
    the strided DMA is free in practice (measured end-to-end, BENCH.md).
    """
    if layout == "bhnd":
        spec = pl.BlockSpec((None, None, n_pad, d),
                            lambda bi, hi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        # bnhd arrays arrive flattened to [B, N, H*D] (free reshape): the
        # kernel slices heads on the lane dim, which keeps every block
        # legal (last two block dims == array dims).
        spec = pl.BlockSpec((None, n_pad, h * d),
                            lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    return [spec for _ in range(count)]


def _seed_spec(ndim: int = 1):
    zeros = (0, 0)
    if ndim == 1:
        return pl.BlockSpec((1, 1), lambda i, z=zeros: z,
                            memory_space=pltpu.SMEM)
    return pl.BlockSpec((1, 1), lambda bi, hi, z=zeros: z,
                        memory_space=pltpu.SMEM)


def _interpret() -> bool:
    """Compiled Mosaic on TPU; interpreter elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def _fwd(q, k, v, seed, *, scale, n_valid, dropout_rate, layout):
    b, h, n_pad, d = _dims(q, layout)
    if layout == "bnhd":
        shape4 = q.shape
        q, k, v = (x.reshape(b, n_pad, h * d) for x in (q, k, v))
    body = _fwd_kernel if layout == "bhnd" else functools.partial(
        _fwd_kernel_allheads, n_heads=h)
    kernel = functools.partial(body, scale=scale, n_valid=n_valid,
                               dropout_rate=dropout_rate)
    grid = (b, h) if layout == "bhnd" else (b,)
    semantics = ("parallel",) * len(grid)   # programs are independent; let
    #                                         Mosaic split them over the two
    #                                         v5e megacores
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[_seed_spec(len(grid))] + _bh_specs(layout, h, n_pad, d, 3),
        out_specs=_bh_specs(layout, h, n_pad, d, 1)[0],
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * d,
            bytes_accessed=4 * b * h * n_pad * d * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad),
    )(seed, q, k, v)
    return out.reshape(shape4) if layout == "bnhd" else out


def _dims(q, layout):
    if layout == "bhnd":
        b, h, n_pad, d = q.shape
    else:
        b, n_pad, h, d = q.shape
    return b, h, n_pad, d


def _bwd(q, k, v, do, seed, *, scale, n_valid, dropout_rate, layout):
    b, h, n_pad, d = _dims(q, layout)
    if layout == "bnhd":
        shape4 = q.shape
        q, k, v, do = (x.reshape(b, n_pad, h * d) for x in (q, k, v, do))
    body = _bwd_kernel if layout == "bhnd" else functools.partial(
        _bwd_kernel_allheads, n_heads=h)
    kernel = functools.partial(body, scale=scale, n_valid=n_valid,
                               dropout_rate=dropout_rate)
    grid = (b, h) if layout == "bhnd" else (b,)
    # dk/dv scratch accumulates only within one program (zeroed at program
    # start), so the backward grid is parallel-safe too.
    semantics = ("parallel",) * len(grid)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[_seed_spec(len(grid))] + _bh_specs(layout, h, n_pad, d, 4),
        out_specs=tuple(_bh_specs(layout, h, n_pad, d, 3)),
        out_shape=tuple(jax.ShapeDtypeStruct(t.shape, t.dtype)
                        for t in (q, k, v)),
        scratch_shapes=[pltpu.VMEM((n_pad, d), jnp.float32),
                        pltpu.VMEM((n_pad, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n_pad * n_pad * d,
            bytes_accessed=7 * b * h * n_pad * d * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad),
    )(seed, q, k, v, do)
    if layout == "bnhd":
        outs = tuple(x.reshape(shape4) for x in outs)
    return outs


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

def _n_axis(layout):
    return 2 if layout == "bhnd" else 1


def _pad_n(x, n_pad, layout):
    axis = _n_axis(layout)
    n = x.shape[axis]
    if n == n_pad:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, n_pad - n)
    return jnp.pad(x, pads)


def _unpad_n(x, n, layout):
    if x.shape[_n_axis(layout)] == n:
        return x
    return (x[:, :, :n] if layout == "bhnd" else x[:, :n])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 7))
def _flash(q, k, v, scale, dropout_rate, n_valid, seed, layout):
    out, _ = _flash_fwd(q, k, v, scale, dropout_rate, n_valid, seed, layout)
    return out


def _flash_fwd(q, k, v, scale, dropout_rate, n_valid, seed, layout):
    n = q.shape[_n_axis(layout)]
    n_pad = pl.cdiv(n, LANE) * LANE
    args = [_pad_n(x, n_pad, layout) for x in (q, k, v)]
    o = _fwd(*args, seed, scale=scale, n_valid=n_valid,
             dropout_rate=dropout_rate, layout=layout)
    return _unpad_n(o, n, layout), (q, k, v, seed)


def _flash_bwd(scale, dropout_rate, n_valid, layout, residuals, g):
    q, k, v, seed = residuals
    n = q.shape[_n_axis(layout)]
    n_pad = pl.cdiv(n, LANE) * LANE
    args = [_pad_n(x, n_pad, layout) for x in (q, k, v, g)]
    dq, dk, dv = _bwd(*args, seed, scale=scale, n_valid=n_valid,
                      dropout_rate=dropout_rate, layout=layout)
    return (_unpad_n(dq, n, layout), _unpad_n(dk, n, layout),
            _unpad_n(dv, n, layout), None)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float, dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    n_valid: Optional[int] = None,
                    layout: str = "bhnd") -> jax.Array:
    """softmax(q k^T * scale) v with fused TPU kernel.

    ``layout`` selects the storage convention: "bhnd" ([B, H, N, D], the
    classic layout) or "bnhd" ([B, N, H, D] — what the fused LN+QKV kernel
    emits; the output comes back in the same layout so the head merge before
    the out-projection is a free reshape).

    ``n_valid`` (static) masks trailing key positions — callers running a
    pre-padded token stream pass the true length and keep N lane-aligned so
    no per-call padding copies happen here.
    """
    assert layout in ("bhnd", "bnhd")
    n = q.shape[_n_axis(layout)]
    # Tiny head dims (the reference's d_model=2 temporal head) and very long
    # sequences don't fit this kernel's regime; the in-kernel PRNG dropout
    # only lowers on real TPUs (no CPU interpret rule for prng_seed).
    if (n > MAX_RESIDENT_N or q.shape[-1] < 8
            or (dropout_rate > 0.0 and _interpret())):
        # XLA fallback works in bhnd; convert at the boundary (only hit for
        # tiny head dims, very long N, or CPU-interpret dropout).
        if layout == "bnhd":
            to_bhnd = lambda x: x.transpose(0, 2, 1, 3)
            out = flash_attention(
                to_bhnd(q), to_bhnd(k), to_bhnd(v), scale=scale,
                dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                n_valid=n_valid, layout="bhnd")
            return out.transpose(0, 2, 1, 3)
        from neurovit_tpu.ops.attention import _sdpa_xla
        if n_valid is not None and n_valid < n:
            neg = jnp.full((n,), NEG_INF, dtype=jnp.float32)
            bias = jnp.where(jnp.arange(n) < n_valid, 0.0, neg)
            return _sdpa_xla_masked(q, k, v, scale=scale, bias=bias,
                                    dropout_rate=dropout_rate,
                                    dropout_rng=dropout_rng)
        return _sdpa_xla(q, k, v, scale=scale, dropout_rate=dropout_rate,
                         dropout_rng=dropout_rng,
                         deterministic=dropout_rate == 0.0)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    return _flash(q, k, v, scale, float(dropout_rate),
                  int(n_valid) if n_valid is not None else n, seed, layout)


def _sdpa_xla_masked(q, k, v, *, scale, bias, dropout_rate, dropout_rng):
    dots = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    dots = dots + bias[None, None, None, :]
    attn = jax.nn.softmax(dots, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, attn.shape)
        attn = jnp.where(mask, attn / keep, 0.0)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
