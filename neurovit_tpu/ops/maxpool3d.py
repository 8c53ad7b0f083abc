"""Pallas 3-D max-pool (k=3, s=2, p=1) with an in-kernel-argmax backward.

The reference stem pool (`/root/reference/src/models/resnet_3d.py:161`,
`nn.MaxPool3d(kernel_size=3, stride=2, padding=1)`) autodiffs on TPU to
XLA's select-and-scatter, a windowed scan costing ~24-29 ms of the b64
ResNet step (BENCH.md "ResNet").  Both scatter-free XLA reformulations
(polyphase taps, separable 1-D pools) lost to it — stride-2 slices on
HBM-resident tiled dims force relayout copies (BENCH.md "Max-pool backward
alternatives").  This module is the remaining route: do the strided
reshuffling in VMEM, where it is vector work instead of HBM traffic.

* Forward kernel: per (batch, output-depth-row) grid step, loads the three
  covering input depth rows, computes the window max at input resolution
  (9 shifted-view taps over a -inf-padded slab, after a 3-way depth
  combine), downsamples by 2, and emits BOTH the pooled value and an int32
  window-argmax code (0..26, first strict winner).  One x read, out-size
  value + code writes — no second forward pass, and the autodiff residual
  is the code array alone (select-and-scatter keeps x AND out live).
* Backward kernel: pure gather.  Each input row (b, d) is covered by at
  most two output rows per spatial dim; the kernel re-expands the upstream
  gradient through the stored codes with parity interleaves (stack +
  reshape on VMEM values) — no scatter, no atomic, no select scan.

Tie semantics: the FIRST attaining window position wins (torch's
convention — `MaxPool3d` routes the gradient to one winner), where JAX's
reduce_window autodiff splits it among all winners.  The winner order here
is depth-major-at-fixed-(h,w) rather than torch's full row-major window
order; post-BN+ReLU feature maps tie only at exact ReLU zeros, whose
gradient dies in the ReLU backward anyway (see `max_pool3d_taps`).

Selected via NEUROVIT_MAXPOOL=pallas (models/resnet3d.py); the XLA
reduce_window path stays the golden reference in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurovit_tpu.ops.flash_attention import _interpret

_KSIZE, _STRIDE, _PAD = 3, 2, 1


def _out_dim(n: int) -> int:
    return (n + 2 * _PAD - _KSIZE) // _STRIDE + 1


def _neg(dtype):
    return (-jnp.inf if jnp.issubdtype(dtype, jnp.floating)
            else jnp.iinfo(dtype).min)


# --------------------------------------------------------------------------
# Forward: window max + argmax code
# --------------------------------------------------------------------------

def _fwd_kernel(xm_ref, x0_ref, xp_ref, out_ref, amax_ref,
                sv_ref, sc_ref, *, d_in, h, w):
    oh, ow = _out_dim(h), _out_dim(w)
    od = pl.program_id(1)
    # All value work is f32: Mosaic on TPU v5e rejects bf16 vector
    # compares outright ("Target does not support this comparison",
    # arith.cmpf on vector<..bf16>) — and the strided scratch read needs
    # 32-bit elements anyway.  Interpret mode (CPU tests) accepts bf16
    # compares, so only the on-chip compile catches this.
    dtype = jnp.float32
    neg = _neg(dtype)

    # Depth combine (kd = 0..2 -> input depth 2*od - 1 + kd), first strict
    # winner keeps the lowest kd.  Out-of-range depth rows (the p=1 pad)
    # are masked to -inf; their ref index was clamped so the DMA is safe.
    best = jnp.where(od > 0, xm_ref[...].astype(dtype), neg)
    kcode = jnp.zeros(best.shape, jnp.int32)
    for kd, row in ((1, x0_ref[...].astype(dtype)),
                    (2, jnp.where(2 * od + 2 <= d_in,
                                  xp_ref[...].astype(dtype), neg))):
        upd = row > best
        kcode = jnp.where(upd, kd, kcode)
        best = jnp.maximum(best, row)

    # Pad h/w by one with -inf so every window tap is a static in-bounds
    # slice of the padded slab (the reshuffle lives in VMEM, not HBM).
    pad_h = jnp.full((1, w, best.shape[-1]), neg, dtype)
    vh = jnp.concatenate([pad_h, best, pad_h], axis=0)
    ch = jnp.concatenate([jnp.zeros_like(pad_h, jnp.int32), kcode,
                          jnp.zeros_like(pad_h, jnp.int32)], axis=0)
    pad_w = jnp.full((h + 2, 1, best.shape[-1]), neg, dtype)
    vp = jnp.concatenate([pad_w, vh, pad_w], axis=1)
    cp = jnp.concatenate([jnp.zeros_like(pad_w, jnp.int32), ch,
                          jnp.zeros_like(pad_w, jnp.int32)], axis=1)

    # 9 (kh, kw) taps at input resolution; code = 9*kd + 3*kh + kw.
    best2 = None
    code2 = None
    for kh in range(_KSIZE):
        for kw in range(_KSIZE):
            tap = vp[kh:kh + h, kw:kw + w, :]
            code = cp[kh:kh + h, kw:kw + w, :] * 9 + (3 * kh + kw)
            if best2 is None:
                best2, code2 = tap, code
            else:
                upd = tap > best2
                code2 = jnp.where(upd, code, code2)
                best2 = jnp.maximum(best2, tap)

    # Stride-2 downsample to output resolution (even positions are the
    # window centres for k=3, s=2, p=1).  Mosaic lowers strided VALUE
    # indexing to gather (2-D only) but strided REF reads to
    # tpu.strided_load — bounce through VMEM scratch (the value-slice
    # form fails to lower on real TPU).  strided_load requires 32-bit
    # element types; best2 is already f32 (codes are int32).
    sv_ref[...] = best2
    sc_ref[...] = code2
    out_ref[...] = sv_ref[:2 * oh:2, :2 * ow:2, :].astype(out_ref.dtype)
    amax_ref[...] = sc_ref[:2 * oh:2, :2 * ow:2, :]


def max_pool3d_argmax(x, *, interpret=None):
    """k=3/s=2/p=1 max pool of NDHWC ``x`` -> (pooled, int32 argmax codes).

    The code at output position o is 9*kd + 3*kh + kw for the first
    window offset attaining the max (depth-major at fixed (h, w)).

    Float inputs only: the kernel compares in f32 (Mosaic rejects bf16
    vector compares), so integer inputs would round through f32 and the
    -inf padding sentinel has no integer analog here."""
    assert jnp.issubdtype(x.dtype, jnp.floating), (
        f"max_pool3d_argmax is float-only (got {x.dtype}): values are "
        "compared and stored through f32 in-kernel")
    b, d, h, w, c = x.shape
    od, oh, ow = _out_dim(d), _out_dim(h), _out_dim(w)
    if interpret is None:
        interpret = _interpret()

    def row(offset):
        # Squeezed single-depth-row blocks: the block index IS the element
        # index along depth; clamp keeps edge DMAs in bounds (the kernel
        # masks the clamped rows to -inf).
        return pl.BlockSpec(
            (None, None, h, w, c),
            functools.partial(
                lambda bi, oi, k: (bi, jnp.clip(2 * oi + k, 0, d - 1),
                                   0, 0, 0), k=offset),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((None, None, oh, ow, c),
                            lambda bi, oi: (bi, oi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, d_in=d, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(b, od),
        in_specs=[row(-1), row(0), row(1)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, od, oh, ow, c), x.dtype),
                   jax.ShapeDtypeStruct((b, od, oh, ow, c), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((h, w, c), jnp.float32),
                        pltpu.VMEM((h, w, c), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, x, x)


# --------------------------------------------------------------------------
# Backward: gather through the argmax codes
# --------------------------------------------------------------------------

def _expand_w(sel0, sel1, sel2, w):
    """Route per-(kw, ow) gradient shares back to input-width positions.

    Input w = 2*ow + kw - 1: even w take the kw=1 share at ow = w/2; odd w
    take kw=0 at ow = (w+1)/2 plus kw=2 at ow = (w-1)/2.  The interleave is
    a stack+reshape on VMEM values (the HBM version of this reshuffle is
    what sank the XLA taps formulation)."""
    zero_col = jnp.zeros_like(sel0[:, :1, :])
    odd = jnp.concatenate([sel0[:, 1:, :], zero_col], axis=1) + sel2
    inter = jnp.stack([sel1, odd], axis=2)
    ohh, oww, _, c = inter.shape
    return inter.reshape(ohh, 2 * oww, c)[:, :w, :]


def _bwd_kernel(glo_ref, ghi_ref, alo_ref, ahi_ref, dx_ref,
                *, o_d, h, w):
    oh, ow = _out_dim(h), _out_dim(w)
    idd = pl.program_id(1)
    odd_row = idd % 2
    acc = None

    # Each input depth row is covered by <= 2 output rows: od = id//2 with
    # kd = 1 + (id % 2), and (odd rows only) od = (id+1)//2 with kd = 0.
    choices = (
        (glo_ref, alo_ref, 1 + odd_row, jnp.int32(1)),
        (ghi_ref, ahi_ref, jnp.int32(0),
         (odd_row == 1) & ((idd + 1) // 2 <= o_d - 1)),
    )
    for g_ref, a_ref, kd, valid in choices:
        g = g_ref[...].astype(jnp.float32) * valid.astype(jnp.float32)
        a = a_ref[...]
        rows = []
        for kh in range(_KSIZE):
            sels = [jnp.where(a == 9 * kd + 3 * kh + kw, g, 0.0)
                    for kw in range(_KSIZE)]
            rows.append(_expand_w(*sels, w=w))
        # Same parity routing along h: even h <- kh=1 at oh=h/2; odd h <-
        # kh=0 at oh=(h+1)/2 plus kh=2 at oh=(h-1)/2.
        zero_row = jnp.zeros_like(rows[0][:1])
        odd_h = jnp.concatenate([rows[0][1:], zero_row], axis=0) + rows[2]
        inter = jnp.stack([rows[1], odd_h], axis=1)
        contrib = inter.reshape(2 * oh, w, inter.shape[-1])[:h]
        acc = contrib if acc is None else acc + contrib
    dx_ref[...] = acc.astype(dx_ref.dtype)


def max_pool3d_argmax_bwd(amax, g, x_shape, x_dtype, *, interpret=None):
    """Gradient of the k=3/s=2/p=1 pool from stored argmax codes."""
    b, d, h, w, c = x_shape
    o_d, oh, ow = _out_dim(d), _out_dim(h), _out_dim(w)
    if interpret is None:
        interpret = _interpret()

    def out_row(which):
        def imap(bi, ii):
            od = ii // 2 if which == "lo" else jnp.clip(
                (ii + 1) // 2, 0, o_d - 1)
            return (bi, od, 0, 0, 0)
        return pl.BlockSpec((None, None, oh, ow, c), imap,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_bwd_kernel, o_d=o_d, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(b, d),
        in_specs=[out_row("lo"), out_row("hi"), out_row("lo"),
                  out_row("hi")],
        out_specs=pl.BlockSpec((None, None, h, w, c),
                               lambda bi, ii: (bi, ii, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), x_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g, g, amax, amax)


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pooled(x, x_shape, dtype_name):
    return max_pool3d_argmax(x)[0]


def _pallas_fwd(x, x_shape, dtype_name):
    out, amax = max_pool3d_argmax(x)
    return out, amax


def _pallas_bwd(x_shape, dtype_name, amax, g):
    return (max_pool3d_argmax_bwd(amax, g, x_shape,
                                  jnp.dtype(dtype_name)),)


_pooled.defvjp(_pallas_fwd, _pallas_bwd)


def max_pool3d_pallas(x):
    """``max_pool3d(x, 3, 2, 1)`` with the Pallas argmax backward."""
    return _pooled(x, x.shape, x.dtype.name)
