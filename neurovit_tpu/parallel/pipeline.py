"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference is single-GPU (no torch.distributed anywhere — SURVEY §5.8),
so pipelining has no counterpart to translate; this is the TPU-native
scale-out path for models whose stacked block parameters exceed one chip
(or whose dp+tp mapping leaves ICI idle along one mesh dimension). The
design follows the scaling-book SPMD pipelining recipe: the stacked block
parameters are sharded over the ``pipe`` axis (each device holds
``depth / n_stages`` contiguous blocks), and a ``jax.shard_map`` manual
region rotates microbatch activations stage-to-stage with
``lax.ppermute`` while every other mesh axis (data, model) stays under the
automatic SPMD partitioner (``axis_names={'pipe'}``).

Schedule: plain GPipe fill-drain. With M microbatches and P stages the
loop runs M + P - 1 ticks; at tick t stage 0 ingests microbatch
``min(t, M-1)``, every stage applies its local blocks, the last stage
banks its result for microbatch ``t - P + 1``, and activations
``ppermute`` one hop down the ring. The bubble fraction is
(P-1)/(M+P-1) — pick ``n_micro >= 2*n_stages`` to keep it under ~33%.

The backward schedule is not hand-written: ``jax.vjp`` through the scan
transposes each ``ppermute`` into the reverse-direction hop and replays
the ticks in reverse — the standard GPipe backward, with all microbatch
activations live (compose with ``jax.checkpoint`` on the block fn to trade
FLOPs for that memory, exactly as the non-pipelined path does).

Exit: the banked outputs live on the last stage only; a masked ``psum``
broadcasts them pipe-wide so downstream (pool + head + loss) computes
replicated over ``pipe`` — negligible duplicate work, and its transpose
correctly routes cotangents back to the last stage.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from neurovit_tpu.parallel.mesh import PIPE_AXIS


def pipeline_blocks(block_fn, stacked_blocks: Any, stacked_rngs: jax.Array,
                    x: jax.Array, *, n_stages: int,
                    n_micro: Optional[int] = None,
                    contains_pallas: bool = False):
    """Run ``depth`` stacked blocks over ``x`` pipelined across ``pipe``.

    block_fn(block_params, h, block_rng, micro_idx) -> h applies ONE
    block; ``micro_idx`` is the traced microbatch index (fold it into the
    rng so per-microbatch dropout masks decorrelate — each microbatch is a
    different slice of the batch and must not reuse the same mask). The
    stacked_blocks pytree has a leading depth axis (lax.scan layout,
    vit3d._init_blocks), stacked_rngs is [depth, ...] per-block RNG data.
    ``x`` is [B, ...] with B divisible by ``n_micro`` (default
    ``2 * n_stages``, halved until it divides B). Requires the ambient
    mesh (jax.set_mesh) to carry a ``pipe`` axis of size ``n_stages``.
    Set ``contains_pallas`` when block_fn calls pallas kernels — it
    relaxes a static lint those kernels can't satisfy (see below).
    """
    depth = jax.tree.leaves(stacked_blocks)[0].shape[0]
    if depth % n_stages != 0:
        raise ValueError(
            f"pipeline: depth {depth} not divisible by {n_stages} stages")
    batch = x.shape[0]
    if n_micro is None:
        n_micro = 2 * n_stages
        while batch % n_micro != 0:
            n_micro //= 2
    if n_micro < 1 or batch % n_micro != 0:
        raise ValueError(
            f"pipeline: batch {batch} not divisible by {n_micro} microbatches")

    def inner(local_blocks, local_rngs, xm):
        stage = jax.lax.axis_index(PIPE_AXIS)
        n_ticks = n_micro + n_stages - 1

        def local_stack(h, micro_idx):
            def body(c, xs):
                bp, br = xs
                return block_fn(bp, c, br, micro_idx), None
            out, _ = jax.lax.scan(body, h, (local_blocks, local_rngs),
                                  unroll=True)
            return out

        def tick(carry, t):
            buf, out = carry
            inject = xm[jnp.minimum(t, n_micro - 1)]
            h = jnp.where(stage == 0, inject, buf)
            # Microbatch flowing through this stage at tick t (clamped for
            # fill/drain ticks whose result is discarded anyway).
            micro_idx = jnp.clip(t - stage, 0, n_micro - 1)
            y = local_stack(h, micro_idx)
            done = jnp.logical_and(stage == n_stages - 1, t >= n_stages - 1)
            out = jnp.where(done,
                            out.at[jnp.maximum(t - (n_stages - 1), 0)].set(y),
                            out)
            nxt = jax.lax.ppermute(
                y, PIPE_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (nxt, out), None

        # The tick outputs are pipe-varying (they depend on axis_index), so
        # the zeros carry must be cast to pipe-varying for the scan's
        # carry-type check (vma lint) to accept it.
        carry0 = jax.lax.pcast((jnp.zeros_like(xm[0]), jnp.zeros_like(xm)),
                               (PIPE_AXIS,), to="varying")
        (_, out), _ = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
        # Broadcast the last stage's banked outputs pipe-wide (masked psum);
        # the transpose routes output cotangents back to the last stage.
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)),
            PIPE_AXIS)

    xm = x.reshape((n_micro, batch // n_micro) + x.shape[1:])
    # check_vma is disabled ONLY when block_fn contains pallas_call kernels
    # (the fused bf16 serving path, the int8 serving kernels — their
    # out_shapes carry no varying-manual-axes annotation, and in interpret
    # mode (CPU tests) the emulated kernel mixes non-varying constants with
    # varying inputs, which the vma checker rejects outright). The check is
    # a static lint, not semantics; for the pallas path correctness is
    # pinned by the pipeline-vs-single-device numerics tests
    # (tests/test_pipeline.py, test_int8_serving.py quant x pp). The plain
    # XLA path KEEPS the lint so future replication bugs in this manual
    # region fail the static check (advisor r4).
    out = jax.shard_map(
        inner,
        in_specs=(P(PIPE_AXIS), P(PIPE_AXIS), P()),
        out_specs=P(),
        axis_names={PIPE_AXIS},
        check_vma=not contains_pallas,
    )(stacked_blocks, stacked_rngs, xm)
    return out.reshape(x.shape)
