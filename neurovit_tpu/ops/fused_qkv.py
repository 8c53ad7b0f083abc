"""Fused LayerNorm + QKV-projection Pallas TPU kernel with custom VJP.

Computes the attention block's pre-norm projection (reference
``src/models/vit_3d.py:37-47`` semantics) in one kernel per M-block:

    u = LN(x) * gamma + beta
    q, k, v = split(u @ Wqkv)          # no bias (vit_3d.py:41)

TPU-first design (completes the §2.0 attention-path fusion):

- removes the standalone LayerNorm passes: the row stats are computed on
  the x block already in VMEM for the matmul, so the separate normed-tensor
  round trip and the backward dnormed round trip never touch HBM,
- Wqkv ([dim, 3*inner] bf16, ~3 MB) stays VMEM-resident across the M grid,
- q/k/v are emitted as separate [M, inner] outputs that reshape (zero-copy)
  to the [B, N, H, D] layout the flash-attention kernel consumes — the
  per-head transpose the old bnd,dhe->bhne einsum performed disappears from
  the graph entirely,
- u is emitted once (bf16) as both the Grad-CAM probe activation and the
  operand of the dWqkv einsum (same tensor XLA autodiff would save),
- backward: one data-grad kernel computes du = [dq|dk|dv] @ Wqkv^T and the
  LayerNorm backward in VMEM, accumulating dgamma/dbeta in f32 scratch;
  dWqkv = u^T [dq|dk|dv] runs as a big XLA einsum (measured pattern from
  ops/fused_mlp.py: in-kernel dW matmuls serialize the MXU and lose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurovit_tpu.nn import LN_EPS
from neurovit_tpu.ops.flash_attention import _interpret
from neurovit_tpu.ops.common import const_spec, pad_m, row_spec

BLOCK_M = 512
_FWD_COMPILER_PARAMS = pltpu.CompilerParams(
    # Forward has no cross-block state: parallel over the two megacores.
    dimension_semantics=("parallel",),
    vmem_limit_bytes=100 * 1024 * 1024)
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),   # dgamma/dbeta accumulate serially
    vmem_limit_bytes=100 * 1024 * 1024)


def _ln(xf):
    """Per-row (xhat, rstd) in f32 (matches nn.layer_norm)."""
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    return xc * rstd, rstd


def _fwd_kernel(x_ref, gamma_ref, beta_ref, w_ref, q_ref, k_ref, v_ref,
                u_ref):
    inner = q_ref.shape[1]
    xf = x_ref[...].astype(jnp.float32)
    xhat, _ = _ln(xf)
    u = (xhat * gamma_ref[0].astype(jnp.float32)
         + beta_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    u_ref[...] = u
    out = jnp.dot(u, w_ref[...], preferred_element_type=jnp.float32)
    q_ref[...] = out[:, :inner].astype(q_ref.dtype)
    k_ref[...] = out[:, inner:2 * inner].astype(k_ref.dtype)
    v_ref[...] = out[:, 2 * inner:].astype(v_ref.dtype)


def _bwd_kernel(dq_ref, dk_ref, dv_ref, x_ref, gamma_ref, w_ref,
                dx_ref, dg_out, db_out, dgamma_acc, dbeta_acc):
    gamma = gamma_ref[0].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_acc[...] = jnp.zeros_like(dgamma_acc)
        dbeta_acc[...] = jnp.zeros_like(dbeta_acc)

    xf = x_ref[...].astype(jnp.float32)
    xhat, rstd = _ln(xf)

    dqkv = jnp.concatenate([dq_ref[...], dk_ref[...], dv_ref[...]], axis=1)
    # du = dqkv @ W^T (contract the 3*inner output dim), f32 MXU accumulation.
    du = jax.lax.dot_general(
        dqkv, w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dgamma_acc[...] += jnp.sum(du * xhat, axis=0, keepdims=True)
    dbeta_acc[...] += jnp.sum(du, axis=0, keepdims=True)

    dxhat = du * gamma
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _flush():
        dg_out[...] = dgamma_acc[...]
        db_out[...] = dbeta_acc[...]


def _fwd_call(x2d, gamma, beta, w):
    m, dim = x2d.shape
    inner = w.shape[1] // 3
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    outs = pl.pallas_call(
        _fwd_kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[row_spec(BLOCK_M, dim), const_spec((1, dim)),
                  const_spec((1, dim)), const_spec((dim, 3 * inner))],
        out_specs=(row_spec(BLOCK_M, inner), row_spec(BLOCK_M, inner),
                   row_spec(BLOCK_M, inner), row_spec(BLOCK_M, dim)),
        out_shape=(jax.ShapeDtypeStruct((m_pad, inner), x2d.dtype),
                   jax.ShapeDtypeStruct((m_pad, inner), x2d.dtype),
                   jax.ShapeDtypeStruct((m_pad, inner), x2d.dtype),
                   jax.ShapeDtypeStruct((m_pad, dim), x2d.dtype)),
        compiler_params=_FWD_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * dim * 3 * inner,
            bytes_accessed=(2 * m_pad * dim + 3 * m_pad * inner
                            + 3 * dim * inner) * x2d.dtype.itemsize,
            transcendentals=0),
    )(pad_m(x2d, m_pad), gamma[None], beta[None], w)
    q, k, v, u = outs
    return q[:m], k[:m], v[:m], u[:m]


def _bwd_call(dq, dk, dv, x2d, gamma, w):
    m, dim = x2d.shape
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    inner = w.shape[1] // 3
    dx, dgamma, dbeta = pl.pallas_call(
        _bwd_kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[row_spec(BLOCK_M, inner), row_spec(BLOCK_M, inner),
                  row_spec(BLOCK_M, inner), row_spec(BLOCK_M, dim),
                  const_spec((1, dim)), const_spec((dim, 3 * inner))],
        out_specs=(row_spec(BLOCK_M, dim), const_spec((1, dim)),
                   const_spec((1, dim))),
        out_shape=(jax.ShapeDtypeStruct((m_pad, dim), x2d.dtype),
                   jax.ShapeDtypeStruct((1, dim), jnp.float32),
                   jax.ShapeDtypeStruct((1, dim), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((1, dim), jnp.float32),
                        pltpu.VMEM((1, dim), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * dim * 3 * inner,
            bytes_accessed=(2 * m_pad * dim + 3 * m_pad * inner
                            + 3 * dim * inner) * x2d.dtype.itemsize,
            transcendentals=0),
    )(pad_m(dq, m_pad), pad_m(dk, m_pad), pad_m(dv, m_pad),
      pad_m(x2d, m_pad), gamma[None], w)
    return dx[:m], dgamma[0], dbeta[0]


@jax.custom_vjp
def _fused(x2d, gamma, beta, w):
    q, k, v, _ = _fwd_call(x2d, gamma, beta, w)
    return q, k, v


def _fused_fwd(x2d, gamma, beta, w):
    q, k, v, u = _fwd_call(x2d, gamma, beta, w)
    return (q, k, v), (x2d, gamma, w, u)


def _fused_bwd(residuals, grads):
    x2d, gamma, w, u = residuals
    dq, dk, dv = grads
    dx, dgamma, dbeta = _bwd_call(dq, dk, dv, x2d, gamma, w)
    # dW = u^T [dq|dk|dv] — bf16 operands, f32 MXU accumulation (one big
    # XLA einsum overlaps better than in-kernel per-block dW matmuls).
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)
    dw = jax.lax.dot_general(
        u, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dgamma, dbeta, dw


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ln_qkv(block: dict, x: jax.Array, heads: int, dim_head: int):
    """LN(x) then the bias-free QKV projection, [B, N, dim] ->
    q, k, v each [B, N, H, D] (the flash kernel's bnhd layout).

    Caller (models/vit3d.py) falls back to the XLA composition when the
    Grad-CAM probe needs the LN activation with a shift applied.
    """
    b, n, dim = x.shape
    inner = heads * dim_head
    gamma = block["attn_norm"]["scale"].astype(jnp.float32)
    beta = block["attn_norm"]["bias"].astype(jnp.float32)
    w = block["qkv"]["kernel"].astype(x.dtype)
    q, k, v = _fused(x.reshape(b * n, dim), gamma, beta, w)
    shape = (b, n, heads, dim_head)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)
