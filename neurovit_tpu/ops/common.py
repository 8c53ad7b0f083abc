"""Shared Pallas wrapper helpers for the row-blocked (M-grid) kernels
(fused_mlp / fused_qkv / fused_outproj): block specs over [M, width]
operands, VMEM-resident constants, SMEM seeds, and M padding."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def row_spec(bm: int, width: int) -> pl.BlockSpec:
    """[bm, width] row block indexed by the (1D) M grid."""
    return pl.BlockSpec((bm, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def const_spec(shape) -> pl.BlockSpec:
    """Whole-array VMEM-resident operand (weights, scales)."""
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)


def seed_spec() -> pl.BlockSpec:
    """(1, 1) int32 PRNG seed in SMEM, shared by every program."""
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def pad_m(x, m_pad: int):
    """Zero-pad rows to the block multiple (pad rows carry zero cotangents,
    so in-kernel parameter-grad accumulators are unaffected)."""
    m = x.shape[0]
    return x if m == m_pad else jnp.pad(x, ((0, m_pad - m), (0, 0)))
