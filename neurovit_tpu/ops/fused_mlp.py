"""Fused residual MLP block Pallas TPU kernel with custom VJP.

Computes the ViT feed-forward block (reference ``src/models/vit_3d.py:14-26``
semantics) in one kernel per M-block:

    y = x + Drop(W2 @ Drop(GELU(W1 @ LN(x) + b1)) + b2)

TPU-first design (the §2.0 "fused LN+GELU MLP" native component):

- the train step is HBM-bandwidth-bound (~90 GB accessed / step at batch 64,
  XLA cost analysis); this kernel removes the LayerNorm round trip, the GELU/
  dropout intermediates, the dropout mask tensors, and the residual-add round
  trip from HBM — W1/W2 stay VMEM-resident across the M-grid, activations
  stream through in row blocks,
- dropout masks are generated *inside* the kernel from the TPU PRNG (uint8
  draws, keep quantized to q/256 exactly like ``nn.dropout``); the backward
  regenerates identical masks from the same per-program seed instead of
  storing [M, mlp_dim] masks,
- exact-erf GELU (torch ``nn.GELU`` default) via the Abramowitz-Stegun
  7.1.26 rational approximation (|err| <= 1.5e-7 — below bf16 resolution;
  Mosaic has no erf primitive),
- custom VJP: a data-grad kernel recomputes LN/GELU/masks from (x, h) and
  emits dx plus the (u, a, dz, dh) operands the dW1/dW2 einsums need, with
  dgamma/dbeta accumulated in f32 VMEM scratch across the sequential grid —
  the [M, hid] intermediates make exactly one HBM round trip each,
- all matmuls hit the MXU in bf16 with f32 accumulation, matching the XLA
  golden path's dtype casts (h is stored bf16 — the same tensor XLA's
  autodiff saves).

Inputs [B, N, dim]; M = B*N is padded to the row-block size (pad rows carry
zero cotangents, so the dW reductions are unaffected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurovit_tpu.nn import LN_EPS
from neurovit_tpu.ops.flash_attention import (_dropout_mask, _interpret,
                                              _quantized_keep)
from neurovit_tpu.ops.common import (const_spec, pad_m, row_spec,
                                      seed_spec)

BLOCK_M = 512
INV_SQRT2 = 0.7071067811865476
INV_SQRT2PI = 0.3989422804014327
# Resident weights + f32 row-block intermediates exceed the default 16 MB
# scoped-VMEM budget; v5e has 128 MB of VMEM. "arbitrary" keeps the M grid
# sequential (the dgamma/dbeta scratch accumulates across grid steps, so the
# grid must not be split across megacores).
_FWD_COMPILER_PARAMS = pltpu.CompilerParams(
    # The forward has no cross-block state: parallel over the two megacores.
    dimension_semantics=("parallel",),
    vmem_limit_bytes=100 * 1024 * 1024)
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (f32, |err| <= 1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    e = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * e


def _gelu(x):
    """Exact-erf GELU on f32 (vit_3d.py:20 — torch nn.GELU default)."""
    return 0.5 * x * (1.0 + _erf(x * INV_SQRT2))


def _gelu_grad(x):
    """d/dx gelu(x) = Phi(x) + x * phi(x) on f32."""
    return (0.5 * (1.0 + _erf(x * INV_SQRT2))
            + x * jnp.exp(-0.5 * x * x) * INV_SQRT2PI)


def _ln_stats(xf):
    """Per-row (xhat, rstd) in f32 (matches nn.layer_norm)."""
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    return xc * rstd, rstd


def _masks(seed_ref, shape1, shape2, keep):
    """Draw the two per-program dropout masks in a fixed order so forward
    and backward regenerate identical bits."""
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    return _dropout_mask(shape1, keep), _dropout_mask(shape2, keep)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, x_ref, gamma_ref, beta_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, y_ref, h_ref, *, dropout_rate: float):
    bm, dim = x_ref.shape
    hid = w1_ref.shape[1]
    keep = _quantized_keep(1.0 - dropout_rate)
    inv_keep = 1.0 / keep

    xf = x_ref[...].astype(jnp.float32)
    xhat, _ = _ln_stats(xf)
    u = (xhat * gamma_ref[0].astype(jnp.float32)
         + beta_ref[0].astype(jnp.float32)).astype(x_ref.dtype)

    h = jnp.dot(u, w1_ref[...], preferred_element_type=jnp.float32)
    h = (h + b1_ref[0].astype(jnp.float32)).astype(h_ref.dtype)
    h_ref[...] = h                      # saved for backward (bf16, same
    #                                     tensor XLA autodiff would save)
    g = _gelu(h.astype(jnp.float32))
    if dropout_rate > 0.0:
        mask1, mask2 = _masks(seed_ref, (bm, hid), (bm, dim), keep)
        g = g * (mask1 * inv_keep)

    z = jnp.dot(g.astype(x_ref.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    z = z + b2_ref[0].astype(jnp.float32)
    if dropout_rate > 0.0:
        z = z * (mask2 * inv_keep)
    y_ref[...] = (z + xf).astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# Backward (data-grad) kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, dy_ref, x_ref, h_ref, gamma_ref, beta_ref,
                w1_ref, w2_ref,
                dx_ref, u_ref, a_ref, dz_ref, dh_ref, dg_out, db_out,
                dgamma_acc, dbeta_acc, *, dropout_rate: float):
    bm, dim = x_ref.shape
    hid = h_ref.shape[1]
    keep = _quantized_keep(1.0 - dropout_rate)
    inv_keep = 1.0 / keep
    gamma = gamma_ref[0].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_acc[...] = jnp.zeros_like(dgamma_acc)
        dbeta_acc[...] = jnp.zeros_like(dbeta_acc)

    # Recompute the forward exactly (same casts, same PRNG stream).
    xf = x_ref[...].astype(jnp.float32)
    xhat, rstd = _ln_stats(xf)
    u = (xhat * gamma + beta_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    u_ref[...] = u                       # dW1 = u^T dh (XLA einsum)
    hf = h_ref[...].astype(jnp.float32)
    g = _gelu(hf)
    if dropout_rate > 0.0:
        mask1, mask2 = _masks(seed_ref, (bm, hid), (bm, dim), keep)
        a = g * (mask1 * inv_keep)
    else:
        a = g
    a_ref[...] = a.astype(a_ref.dtype)   # dW2 = a^T dz (XLA einsum)

    dy = dy_ref[...].astype(jnp.float32)
    dz = dy * (mask2 * inv_keep) if dropout_rate > 0.0 else dy
    dz_ref[...] = dz.astype(dz_ref.dtype)
    # da = dz W2^T (contract output dim), f32 accumulation on the MXU.
    da = jax.lax.dot_general(
        dz.astype(x_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = da * _gelu_grad(hf)
    if dropout_rate > 0.0:
        dh = dh * (mask1 * inv_keep)
    dh_ref[...] = dh.astype(dh_ref.dtype)
    # du = dh W1^T.
    du = jax.lax.dot_general(
        dh.astype(x_ref.dtype), w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dgamma_acc[...] += jnp.sum(du * xhat, axis=0, keepdims=True)
    dbeta_acc[...] += jnp.sum(du, axis=0, keepdims=True)

    # LayerNorm backward + the residual path.
    dxhat = du * gamma
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2) + dy
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _flush():
        dg_out[...] = dgamma_acc[...]
        db_out[...] = dbeta_acc[...]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _fwd_call(x2d, gamma, beta, w1, b1, w2, b2, seed, *, dropout_rate):
    m, dim = x2d.shape
    hid = w1.shape[1]
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    kernel = functools.partial(_fwd_kernel, dropout_rate=dropout_rate)
    y, h = pl.pallas_call(
        kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[seed_spec(), row_spec(BLOCK_M, dim),
                  const_spec((1, dim)), const_spec((1, dim)),
                  const_spec((dim, hid)), const_spec((1, hid)),
                  const_spec((hid, dim)), const_spec((1, dim))],
        out_specs=(row_spec(BLOCK_M, dim), row_spec(BLOCK_M, hid)),
        out_shape=(jax.ShapeDtypeStruct((m_pad, dim), x2d.dtype),
                   jax.ShapeDtypeStruct((m_pad, hid), x2d.dtype)),
        compiler_params=_FWD_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * dim * hid,
            bytes_accessed=(2 * m_pad * dim + m_pad * hid + 2 * dim * hid)
            * x2d.dtype.itemsize,
            transcendentals=m_pad * hid),
    )(seed, pad_m(x2d, m_pad), gamma[None], beta[None], w1, b1[None],
      w2, b2[None])
    return y[:m], h[:m]


def _bwd_call(dy, x2d, h, gamma, beta, w1, w2, seed, *, dropout_rate):
    m, dim = x2d.shape
    hid = w1.shape[1]
    m_pad = pl.cdiv(m, BLOCK_M) * BLOCK_M
    kernel = functools.partial(_bwd_kernel, dropout_rate=dropout_rate)
    dt = x2d.dtype
    dx, u, a, dz, dh, dgamma, dbeta = pl.pallas_call(
        kernel,
        grid=(m_pad // BLOCK_M,),
        interpret=_interpret(),
        in_specs=[seed_spec(), row_spec(BLOCK_M, dim),
                  row_spec(BLOCK_M, dim), row_spec(BLOCK_M, hid),
                  const_spec((1, dim)), const_spec((1, dim)),
                  const_spec((dim, hid)), const_spec((hid, dim))],
        out_specs=(row_spec(BLOCK_M, dim), row_spec(BLOCK_M, dim),
                   row_spec(BLOCK_M, hid), row_spec(BLOCK_M, dim),
                   row_spec(BLOCK_M, hid),
                   const_spec((1, dim)), const_spec((1, dim))),
        out_shape=(jax.ShapeDtypeStruct((m_pad, dim), dt),
                   jax.ShapeDtypeStruct((m_pad, dim), dt),
                   jax.ShapeDtypeStruct((m_pad, hid), dt),
                   jax.ShapeDtypeStruct((m_pad, dim), dt),
                   jax.ShapeDtypeStruct((m_pad, hid), dt),
                   jax.ShapeDtypeStruct((1, dim), jnp.float32),
                   jax.ShapeDtypeStruct((1, dim), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((1, dim), jnp.float32),
                        pltpu.VMEM((1, dim), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=8 * m_pad * dim * hid,
            bytes_accessed=(6 * m_pad * dim + 3 * m_pad * hid
                            + 2 * dim * hid) * dt.itemsize,
            transcendentals=2 * m_pad * hid),
    )(seed, pad_m(dy, m_pad), pad_m(x2d, m_pad), pad_m(h, m_pad),
      gamma[None], beta[None], w1, w2)
    return dx[:m], u[:m], a[:m], dz[:m], dh[:m], dgamma[0], dbeta[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused(x2d, gamma, beta, w1, b1, w2, b2, seed, dropout_rate):
    y, _ = _fused_fwd(x2d, gamma, beta, w1, b1, w2, b2, seed, dropout_rate)
    return y


def _fused_fwd(x2d, gamma, beta, w1, b1, w2, b2, seed, dropout_rate):
    y, h = _fwd_call(x2d, gamma, beta, w1, b1, w2, b2, seed,
                     dropout_rate=dropout_rate)
    return y, (x2d, h, gamma, beta, w1, w2, seed)


def _fused_bwd(dropout_rate, residuals, dy):
    x2d, h, gamma, beta, w1, w2, seed = residuals
    dx, u, a, dz, dh, dgamma, dbeta = _bwd_call(
        dy, x2d, h, gamma, beta, w1, w2, seed, dropout_rate=dropout_rate)
    f32 = jnp.float32
    # dW1 = u^T dh, dW2 = a^T dz — bf16 operands, f32 MXU accumulation, cast
    # back to the (bf16) weight-operand dtype exactly like XLA's dot VJP.
    dw1 = jax.lax.dot_general(
        u, dh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(w1.dtype)
    dw2 = jax.lax.dot_general(
        a, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(w2.dtype)
    db1 = jnp.sum(dh.astype(f32), axis=0)
    db2 = jnp.sum(dz.astype(f32), axis=0)
    return dx, dgamma, dbeta, dw1, db1, dw2, db2, None


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

def fused_mlp_block(params: dict, x: jax.Array, *, dropout_rate: float = 0.0,
                    rng=None, deterministic: bool = True) -> jax.Array:
    """Residual MLP block x + Drop(fc2(Drop(gelu(fc1(LN(x)))))), [B, N, D].

    Fused Pallas path for TPU; the caller (models/vit3d.py) falls back to the
    XLA composition when the kernel regime doesn't apply. In-kernel PRNG has
    no CPU interpret lowering, so dropout>0 off-TPU must use the XLA path.
    """
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0:
        if rng is None:
            raise ValueError("dropout requires an rng")
        seed = jax.random.randint(rng, (1, 1), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    b, n, dim = x.shape
    gamma = params["mlp_norm"]["scale"].astype(jnp.float32)
    beta = params["mlp_norm"]["bias"].astype(jnp.float32)
    w1 = params["fc1"]["kernel"].astype(x.dtype)
    b1 = params["fc1"]["bias"].astype(jnp.float32)
    w2 = params["fc2"]["kernel"].astype(x.dtype)
    b2 = params["fc2"]["bias"].astype(jnp.float32)
    y = _fused(x.reshape(b * n, dim), gamma, beta, w1, b1, w2, b2, seed,
               rate)
    return y.reshape(b, n, dim)


def supports(dropout_rate: float, deterministic: bool) -> bool:
    """Whether the fused kernel can run here (mirrors flash_attention's
    gating): dropout needs the TPU PRNG, which has no interpret lowering."""
    return deterministic or dropout_rate == 0.0 or not _interpret()
