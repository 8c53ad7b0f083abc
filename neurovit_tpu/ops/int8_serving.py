"""int8 serving kernels: fused LN + dynamic-quant + int8-MXU GEMM blocks.

Post-training int8 inference for the ViT serving path. The reference has no
quantized path at all (torch fp32/AMP only, ``src/Trainer.py:58-66``); this
is a TPU-native extension justified by measurement: XLA's int8 dot_general
never beat bf16 at the serving shapes (BENCH.md / ROADMAP "int8 quantized
serving" — a compile-strategy lottery), but Mosaic's int8 MXU path runs at
1.5-2x the Pallas bf16 rate WITH the dequant epilogue fused
(`scripts/int8_pallas_bench.py`), and the in-kernel LN -> per-row quantize
-> int8 dot -> dequant composition measures 240 T/s vs 165 TF/s bf16 at the
fc1 shape (probe, round 3).

Scheme (weight-only storage, dynamic activations):

- weights: symmetric per-output-channel int8, quantized ONCE at Predictor
  build (``quantize_blocks``) — w8 = round(w / s_col), s_col = absmax/127.
  Halves the block-weight HBM/VMEM footprint as a side effect.
- activations: symmetric per-row (per-token) dynamic quantization computed
  INSIDE the kernel on the row block already in VMEM — no calibration set,
  no quantized tensors in HBM, no extra memory passes.
- accumulation: int32 on the MXU, dequantized as acc * s_row * s_col in the
  epilogue (f32), then bias/GELU/residual exactly like the bf16 kernels.

Three kernels mirror the bf16 fused serving path one-to-one (same BLOCK_M
row streaming, weights VMEM-resident across the M grid):

    int8_ln_qkv           ~ ops/fused_qkv.fused_ln_qkv       (LN + QKV)
    int8_outproj_residual ~ ops/fused_outproj (deterministic) (proj + res)
    int8_mlp_block        ~ ops/fused_mlp (deterministic)     (full MLP)

Attention (round 4): the PV matmul runs on the int8 MXU too
(``int8_flash_attention``) — the round-4 probe measured int8+dequant at
**5.71x** bf16 on the PV shape (8192x1024x64) but only 1.36x on QK^T
(the K=64 contraction is too short to amortize the MXU pipeline
regardless of dtype), so Q/K/scores/softmax stay bf16/f32 (exact) and
only the probabilities are quantized: P per-row against its row max
(nonneg, so 0..127), V per-channel — both scale vectors broadcast
straight into the dequant epilogue with no transpose. The row
normalizer is summed from the EXACT f32 probabilities before
quantization. A/B via config ``SERVING_INT8_ATTN: off`` (static, bound at model
construction; the NEUROVIT_INT8_ATTN env var seeds the default).

SERVING-ONLY: forward has no custom VJP; ``models/vit3d.py`` dispatches to
these kernels when a block carries ``*_q8`` entries and refuses
non-deterministic calls. Dropout/training goes through the bf16 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurovit_tpu.nn import LN_EPS
from neurovit_tpu.ops.common import const_spec, pad_m, row_spec
from neurovit_tpu.ops.flash_attention import (LANE, LOG2E, MAX_RESIDENT_N,
                                              SCORE_CAP, _block_q, _interpret)
from neurovit_tpu.ops.fused_mlp import _gelu

BLOCK_M = 512
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# Quantization helpers (host/XLA side, run once at Predictor build)
# ---------------------------------------------------------------------------

def quantize_weight(w):
    """Symmetric per-output-channel int8: ``w [..., K, N]`` ->
    ``(w8 int8 [..., K, N], scale f32 [..., 1, N])`` with
    ``w ~= w8 * scale``. Works on scan-stacked ``[depth, K, N]`` weights."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_blocks(blocks: dict) -> dict:
    """ViT block stack -> int8 serving stack.

    Replaces the four GEMM weights (qkv / attn_out / fc1 / fc2) with
    ``{name}_q8 = {"w": int8, "scale": f32 [.., 1, N], "bias": f32?}``
    entries; LayerNorm params pass through. The result slots into the same
    ``lax.scan`` block loop — ``models/vit3d.py`` dispatches on the
    ``_q8`` keys."""
    if "attn_out" not in blocks:
        # vit_3d.py:32 identity out-proj (single full-width head) — the
        # int8 attention path assumes a projection; not a shipped config.
        raise ValueError("int8 serving requires a projecting attention "
                         "(heads*dim_head != dim)")
    out = {"attn_norm": blocks["attn_norm"], "mlp_norm": blocks["mlp_norm"]}
    for name in ("qkv", "attn_out", "fc1", "fc2"):
        if name not in blocks:
            continue
        w8, scale = quantize_weight(blocks[name]["kernel"])
        entry = {"w": w8, "scale": scale}
        if "bias" in blocks[name]:
            entry["bias"] = jnp.asarray(blocks[name]["bias"], jnp.float32)
        out[name + "_q8"] = entry
    return out


def is_quantized(block: dict) -> bool:
    """True if ``block`` (or a stacked block tree) carries int8 serving
    entries. Single source of truth for the quantized-structure check —
    ``models/vit3d.py`` gates the Grad-CAM probe path on it; the per-op
    forward dispatch there keys on the specific ``qkv_q8``/``fc1_q8``
    entries because the attention and MLP paths switch independently."""
    return "qkv_q8" in block or "fc1_q8" in block


# ---------------------------------------------------------------------------
# In-kernel building blocks
# ---------------------------------------------------------------------------

def _ln(xf):
    """Per-row LayerNorm xhat in f32 (matches nn.layer_norm)."""
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    return xc * jax.lax.rsqrt(var + LN_EPS)


def _rowquant(u):
    """Per-row symmetric dynamic quant: f32 [bm, k] -> (int8, scale [bm, 1]).

    M-padding rows are not special here: by the time they reach this they
    have been through LN+beta (so they quantize beta, not zeros). That is
    harmless garbage — the wrappers' ``[:m]`` unpad slices it off; the
    ``amax > 0`` guard only protects against a truly all-zero row dividing
    by zero."""
    amax = jnp.max(jnp.abs(u), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(u / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _deq_dot(q, s_row, w8_ref, s_col_ref):
    """int8 MXU matmul + dequant epilogue -> f32 [bm, n]."""
    acc = jnp.dot(q, w8_ref[...], preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s_row * s_col_ref[0]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _qkv_kernel(x_ref, gamma_ref, beta_ref, w_ref, s_ref,
                q_ref, k_ref, v_ref):
    inner = q_ref.shape[1]
    xf = x_ref[...].astype(jnp.float32)
    u = (_ln(xf) * gamma_ref[0].astype(jnp.float32)
         + beta_ref[0].astype(jnp.float32))
    qa, s_row = _rowquant(u)
    out = _deq_dot(qa, s_row, w_ref, s_ref)
    q_ref[...] = out[:, :inner].astype(q_ref.dtype)
    k_ref[...] = out[:, inner:2 * inner].astype(k_ref.dtype)
    v_ref[...] = out[:, 2 * inner:].astype(v_ref.dtype)


def _outproj_kernel(a_ref, x_ref, w_ref, s_ref, b_ref, y_ref):
    qa, s_row = _rowquant(a_ref[...].astype(jnp.float32))
    z = _deq_dot(qa, s_row, w_ref, s_ref) + b_ref[0].astype(jnp.float32)
    y_ref[...] = (z + x_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _mlp_kernel(x_ref, gamma_ref, beta_ref, w1_ref, s1_ref, b1_ref,
                w2_ref, s2_ref, b2_ref, y_ref):
    xf = x_ref[...].astype(jnp.float32)
    u = (_ln(xf) * gamma_ref[0].astype(jnp.float32)
         + beta_ref[0].astype(jnp.float32))
    q1, s1_row = _rowquant(u)
    h = _deq_dot(q1, s1_row, w1_ref, s1_ref) + b1_ref[0].astype(jnp.float32)
    g = _gelu(h)
    q2, s2_row = _rowquant(g)
    z = _deq_dot(q2, s2_row, w2_ref, s2_ref) + b2_ref[0].astype(jnp.float32)
    y_ref[...] = (z + xf).astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _int8_cost(m, k, n):
    """Nudge the scheduler with the real byte mix (int8 weights)."""
    return pl.CostEstimate(flops=2 * m * k * n,
                           bytes_accessed=2 * m * k + m * n * 2 + k * n,
                           transcendentals=0)


def int8_ln_qkv(block: dict, x: jax.Array, heads: int, dim_head: int):
    """LN + bias-free int8 QKV projection: [B, N, dim] -> q, k, v each
    [B, N, H, D] (flash kernel bnhd layout). Serving analog of
    ``fused_qkv.fused_ln_qkv`` (reference ``vit_3d.py:37-47``)."""
    b, n, dim = x.shape
    inner = heads * dim_head
    qp = block["qkv_q8"]
    gamma = block["attn_norm"]["scale"].astype(jnp.float32)
    beta = block["attn_norm"]["bias"].astype(jnp.float32)
    x2d = x.reshape(b * n, dim)
    m = b * n
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    q, k, v = pl.pallas_call(
        _qkv_kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[row_spec(BLOCK_M, dim), const_spec((1, dim)),
                  const_spec((1, dim)), const_spec((dim, 3 * inner)),
                  const_spec((1, 3 * inner))],
        out_specs=(row_spec(BLOCK_M, inner), row_spec(BLOCK_M, inner),
                   row_spec(BLOCK_M, inner)),
        out_shape=(jax.ShapeDtypeStruct((m_pad, inner), x.dtype),) * 3,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_int8_cost(m_pad, dim, 3 * inner),
    )(pad_m(x2d, m_pad), gamma[None], beta[None], qp["w"],
      qp["scale"].reshape(1, -1))
    shape = (b, n, heads, dim_head)
    return (q[:m].reshape(shape), k[:m].reshape(shape),
            v[:m].reshape(shape))


def int8_outproj_residual(qproj: dict, x: jax.Array, attn2d: jax.Array
                          ) -> jax.Array:
    """x + (attn @ Wout + b) with an int8 MXU projection; serving analog of
    ``fused_outproj`` (reference ``vit_3d.py:44-47,72``)."""
    b, n, dim = x.shape
    inner = attn2d.shape[-1]
    m = b * n
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    y = pl.pallas_call(
        _outproj_kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[row_spec(BLOCK_M, inner), row_spec(BLOCK_M, dim),
                  const_spec((inner, dim)), const_spec((1, dim)),
                  const_spec((1, dim))],
        out_specs=row_spec(BLOCK_M, dim),
        out_shape=jax.ShapeDtypeStruct((m_pad, dim), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_int8_cost(m_pad, inner, dim),
    )(pad_m(attn2d.reshape(m, inner), m_pad),
      pad_m(x.reshape(m, dim), m_pad), qproj["w"],
      qproj["scale"].reshape(1, -1), qproj["bias"].reshape(1, -1))
    return y[:m].reshape(b, n, dim)


def int8_mlp_block(block: dict, x: jax.Array) -> jax.Array:
    """x + fc2(GELU(fc1(LN(x)))) with both GEMMs on the int8 MXU; serving
    analog of ``fused_mlp`` (reference ``vit_3d.py:14-26``)."""
    b, n, dim = x.shape
    p1, p2 = block["fc1_q8"], block["fc2_q8"]
    hid = p1["w"].shape[-1]
    gamma = block["mlp_norm"]["scale"].astype(jnp.float32)
    beta = block["mlp_norm"]["bias"].astype(jnp.float32)
    m = b * n
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    y = pl.pallas_call(
        _mlp_kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[row_spec(BLOCK_M, dim), const_spec((1, dim)),
                  const_spec((1, dim)), const_spec((dim, hid)),
                  const_spec((1, hid)), const_spec((1, hid)),
                  const_spec((hid, dim)), const_spec((1, dim)),
                  const_spec((1, dim))],
        out_specs=row_spec(BLOCK_M, dim),
        out_shape=jax.ShapeDtypeStruct((m_pad, dim), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_int8_cost(m_pad, dim, 2 * hid),
    )(pad_m(x.reshape(m, dim), m_pad), gamma[None], beta[None],
      p1["w"], p1["scale"].reshape(1, -1), p1["bias"].reshape(1, -1),
      p2["w"], p2["scale"].reshape(1, -1), p2["bias"].reshape(1, -1))
    return y[:m].reshape(b, n, dim)


# ---------------------------------------------------------------------------
# int8 attention: PV on the int8 MXU (deterministic / serving only)
# ---------------------------------------------------------------------------

def _attn_pv_kernel(q_ref, k_ref, v_ref, o_ref, *,
                    scale: float, n_valid: int, n_heads: int):
    """All-heads bnhd attention with the PV matmul in int8.

    Same structure as ``flash_attention._fwd_kernel_allheads`` (one program
    per batch element, [n_pad, H*D] slabs VMEM-resident, lane-sliced heads,
    exp2+SCORE_CAP softmax, deferred normalization) with one change: the
    [block_q, N] probabilities are quantized per row against their row max
    (nonnegative, so the full 0..127 range) and V per output channel, and
    the PV contraction runs int8 on the MXU. QK^T stays bf16 — the round-4
    probe measured int8 QK^T at only 1.07-1.36x (the K=64 contraction is
    shape-floor-bound) vs 5.71x for PV (BENCH.md "int8 go/no-go"). The row
    normalizer comes from the exact f32 probabilities, so quantization
    error enters only through the numerator."""
    n_pad, hd = q_ref.shape
    d = hd // n_heads
    block_q = _block_q(n_pad)
    n_blocks = n_pad // block_q

    if n_valid < n_pad:
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 1)
        pad_maskf = (kv_ids < n_valid).astype(jnp.float32)

    for h in range(n_heads):
        k = k_ref[:, pl.ds(h * d, d)]
        vf = v_ref[:, pl.ds(h * d, d)].astype(jnp.float32)
        # Per-channel V quant: the [1, d] scale broadcasts over output rows
        # (a per-token V scale would sit inside the key contraction and not
        # factor out).
        vmax = jnp.max(jnp.abs(vf), axis=0, keepdims=True)
        s_v = jnp.where(vmax > 0, vmax / 127.0, 1.0)
        v8 = jnp.clip(jnp.round(vf / s_v), -127, 127).astype(jnp.int8)
        for qb in range(n_blocks):
            q = q_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E)
            p = jnp.exp2(jnp.clip(s, -SCORE_CAP, SCORE_CAP))
            if n_valid < n_pad:
                p = p * pad_maskf
            denom = jnp.sum(p, axis=1, keepdims=True)
            pmax = jnp.max(p, axis=1, keepdims=True)
            s_p = jnp.where(pmax > 0, pmax / 127.0, 1.0)
            p8 = jnp.clip(jnp.round(p / s_p), 0, 127).astype(jnp.int8)
            acc = jnp.dot(p8, v8, preferred_element_type=jnp.int32)
            o = acc.astype(jnp.float32) * (s_p / denom * s_v)
            o_ref[pl.ds(qb * block_q, block_q), pl.ds(h * d, d)] = (
                o.astype(o_ref.dtype))


def int8_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         scale: float, n_valid=None) -> jax.Array:
    """bnhd ([B, N, H, D]) deterministic attention with int8 PV.

    Serving analog of ``flash_attention(..., layout="bnhd")`` with
    ``dropout_rate=0``; falls back to the bf16 kernel outside its regime
    (tiny head dims, very long sequences)."""
    b, n, h, d = q.shape
    if n > MAX_RESIDENT_N or d < 8:
        from neurovit_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale, dropout_rate=0.0,
                               n_valid=n_valid, layout="bnhd")
    n_valid = int(n_valid) if n_valid is not None else n
    n_pad = pl.cdiv(n, LANE) * LANE
    if n_pad != n:
        pads = ((0, 0), (0, n_pad - n), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, pads) for x in (q, k, v))
    q2, k2, v2 = (x.reshape(b, n_pad, h * d) for x in (q, k, v))
    slab = pl.BlockSpec((None, n_pad, h * d), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_pv_kernel, scale=scale, n_valid=n_valid,
                          n_heads=h),
        grid=(b,),
        interpret=_interpret(),
        in_specs=[slab] * 3,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct(q2.shape, q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * d,
            bytes_accessed=(3 * b * h * n_pad * d * q.dtype.itemsize
                            + b * h * n_pad * d * q.dtype.itemsize),
            transcendentals=b * h * n_pad * n_pad),
    )(q2, k2, v2)
    out = out.reshape(b, n_pad, h, d)
    return out[:, :n] if n_pad != n else out
