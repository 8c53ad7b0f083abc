"""Fused dropout Pallas kernel: generate-and-apply in one VPU pass.

XLA dropout (jax.random.bernoulli + where) costs ~46 ms/step on the flagship
model (12 masks of [32,1001,2048]-scale per step, threefry or RBG bits
round-tripping HBM, masks saved for backward). This kernel:

- draws bits with the on-core TPU PRNG (`pltpu.prng_random_bits`) seeded per
  (call, grid block) and applies the mask in the same pass — one read + one
  write of x, nothing else touches HBM,
- backward **regenerates** the identical mask from the same seed instead of
  storing it (flash-style rematerialization; custom VJP).

Only lowers on real TPUs (no interpret rule for the TPU PRNG); other
backends use the standard jax.random path (``neurovit_tpu.nn.dropout``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_BLOCK_M = 1024


def _mask_kernel(seed_ref, x_ref, o_ref, *, keep: float):
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    threshold = jnp.uint32(int(keep * 4294967295.0))
    mask = (bits < threshold).astype(x_ref.dtype)
    o_ref[...] = x_ref[...] * mask * (1.0 / keep)


def _run(x2d, seed, keep):
    m, c = x2d.shape
    block_m = min(_BLOCK_M, m)
    grid = (pl.cdiv(m, block_m),)
    return pl.pallas_call(
        functools.partial(_mask_kernel, keep=keep),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout(x2d, seed, keep):
    return _run(x2d, seed, keep)


def _dropout_fwd(x2d, seed, keep):
    return _run(x2d, seed, keep), seed


def _dropout_bwd(keep, seed, g):
    # Same seed -> same per-block bits -> identical mask applied to g.
    return _run(g, seed, keep), None


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


def dropout(rng: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout via the fused kernel. x of any rank; the trailing dim
    should be lane-aligned for best throughput (128-multiple)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    seed = jax.random.randint(rng, (1, 1), 0, 2**31 - 1, dtype=jnp.int32)
    shape = x.shape
    c = shape[-1]
    if c % LANE != 0:
        # Unaligned trailing dim: flatten fully and pad to a lane multiple.
        flat = x.reshape(1, -1)
        pad = (-flat.shape[1]) % LANE
        padded = jnp.pad(flat, ((0, 0), (0, pad)))
        out = _dropout(padded.reshape(-1, LANE), seed, keep)
        return out.reshape(1, -1)[:, :flat.shape[1]].reshape(shape)
    return _dropout(x.reshape(-1, c), seed, keep).reshape(shape)


def supported() -> bool:
    return jax.default_backend() == "tpu"
