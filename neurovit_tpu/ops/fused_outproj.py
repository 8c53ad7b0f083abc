"""Fused attention out-projection Pallas TPU kernel with custom VJP.

Computes the attention block's epilogue (reference ``vit_3d.py:44-47``
``to_out = Linear + Dropout`` plus the residual add at ``vit_3d.py:72``) in
one kernel per M-block:

    y = x + Drop(attn @ Wout + b)

- attn arrives as [B, N, H*D] straight from the flash kernel's bnhd output
  (no head-merge transpose anywhere in the graph),
- Wout ([inner, dim] bf16, ~1 MB) stays VMEM-resident across the M grid;
  the dropout mask is drawn in-kernel (uint8, q/256 — nn.dropout semantics)
  and regenerated in the backward from the same per-block seed,
- the residual add rides the same output pass — x never makes a separate
  round trip,
- backward: data-grad kernel emits dx-free outputs (dx == dy for the
  residual path plus the projected gradient): dattn = (dy*mask/keep) @ W^T
  and dz = dy*mask/keep for the dWout/db einsums outside (fused_mlp's
  measured split: big XLA dW einsums beat in-kernel accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurovit_tpu.ops.flash_attention import (_dropout_mask, _interpret,
                                              _quantized_keep)
from neurovit_tpu.ops.common import (const_spec, pad_m, row_spec,
                                      seed_spec)

BLOCK_M = 512
# Both kernels are scratch-free; the M grid splits across the two v5e
# megacores.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_kernel(seed_ref, a_ref, x_ref, w_ref, b_ref, y_ref, *,
                dropout_rate: float):
    bm, dim = x_ref.shape
    keep = _quantized_keep(1.0 - dropout_rate)
    z = jnp.dot(a_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    z = z + b_ref[0].astype(jnp.float32)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        z = z * (_dropout_mask((bm, dim), keep) * (1.0 / keep))
    y_ref[...] = (z + x_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _bwd_kernel(seed_ref, dy_ref, w_ref, da_ref, dz_ref, *,
                dropout_rate: float):
    bm, dim = dy_ref.shape
    keep = _quantized_keep(1.0 - dropout_rate)
    dy = dy_ref[...].astype(jnp.float32)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        dz = dy * (_dropout_mask((bm, dim), keep) * (1.0 / keep))
    else:
        dz = dy
    dz_ref[...] = dz.astype(dz_ref.dtype)
    # dattn = dz @ W^T (contract the output dim).
    da_ref[...] = jax.lax.dot_general(
        dz.astype(w_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(da_ref.dtype)


def _fwd_call(a2d, x2d, w, b, seed, *, dropout_rate):
    m, dim = x2d.shape
    inner = a2d.shape[1]
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    kernel = functools.partial(_fwd_kernel, dropout_rate=dropout_rate)
    y = pl.pallas_call(
        kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[seed_spec(), row_spec(BLOCK_M, inner),
                  row_spec(BLOCK_M, dim), const_spec((inner, dim)),
                  const_spec((1, dim))],
        out_specs=row_spec(BLOCK_M, dim),
        out_shape=jax.ShapeDtypeStruct((m_pad, dim), x2d.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * inner * dim,
            bytes_accessed=(m_pad * inner + 2 * m_pad * dim + inner * dim)
            * x2d.dtype.itemsize,
            transcendentals=0),
    )(seed, pad_m(a2d, m_pad), pad_m(x2d, m_pad), w, b[None])
    return y[:m]


def _bwd_call(dy, w, seed, inner, *, dropout_rate):
    m, dim = dy.shape
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    kernel = functools.partial(_bwd_kernel, dropout_rate=dropout_rate)
    da, dz = pl.pallas_call(
        kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[seed_spec(), row_spec(BLOCK_M, dim),
                  const_spec((inner, dim))],
        out_specs=(row_spec(BLOCK_M, inner), row_spec(BLOCK_M, dim)),
        out_shape=(jax.ShapeDtypeStruct((m_pad, inner), dy.dtype),
                   jax.ShapeDtypeStruct((m_pad, dim), dy.dtype)),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * inner * dim,
            bytes_accessed=(m_pad * inner + 2 * m_pad * dim + inner * dim)
            * dy.dtype.itemsize,
            transcendentals=0),
    )(seed, pad_m(dy, m_pad), w)
    return da[:m], dz[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(a2d, x2d, w, b, seed, dropout_rate):
    return _fwd_call(a2d, x2d, w, b, seed, dropout_rate=dropout_rate)


def _fused_fwd(a2d, x2d, w, b, seed, dropout_rate):
    y = _fwd_call(a2d, x2d, w, b, seed, dropout_rate=dropout_rate)
    return y, (a2d, w, seed)


def _fused_bwd(dropout_rate, residuals, dy):
    a2d, w, seed = residuals
    inner = a2d.shape[1]
    da, dz = _bwd_call(dy, w, seed, inner, dropout_rate=dropout_rate)
    f32 = jnp.float32
    dw = jax.lax.dot_general(
        a2d, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(w.dtype)
    db = jnp.sum(dz.astype(f32), axis=0)
    # Residual path: dx == dy.
    return da, dy, dw, db, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_outproj_residual(attn_out_params: dict, x: jax.Array,
                           attn: jax.Array, *, dropout_rate: float = 0.0,
                           rng=None, deterministic: bool = True) -> jax.Array:
    """x + Drop(attn @ Wout + b); x [B, N, dim], attn [B, N, inner]."""
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0:
        if rng is None:
            raise ValueError("dropout requires an rng")
        seed = jax.random.randint(rng, (1, 1), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    b, n, dim = x.shape
    inner = attn.shape[-1]
    w = attn_out_params["kernel"].astype(x.dtype)
    bias = attn_out_params["bias"].astype(jnp.float32)
    y = _fused(attn.reshape(b * n, inner), x.reshape(b * n, dim), w, bias,
               seed, rate)
    return y.reshape(b, n, dim)


def supports(dropout_rate: float, deterministic: bool) -> bool:
    """In-kernel PRNG dropout has no CPU interpret lowering."""
    return deterministic or dropout_rate == 0.0 or not _interpret()
