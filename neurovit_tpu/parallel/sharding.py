"""Sharding rules: batch over ``data``, Megatron-style TP over ``model``.

With shardings annotated on params and batch, XLA's SPMD partitioner inserts
the collectives (all-reduce for DP gradients over ICI, all-gather/
reduce-scatter around the TP matmuls) — no hand-written NCCL-equivalent code,
per the scaling-book recipe: pick a mesh, annotate, let XLA do the rest.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurovit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                replicate: bool = False) -> Dict[str, Any]:
    """Place the array fields of a host batch on the mesh with batch-dim
    sharding (or replicated, e.g. 4D mode where the model shards the folded
    B*T stream itself).

    Single-process: plain device_put. Multi-process (pod): each host's batch
    is its process-LOCAL rows — the Trainer's DataLoaders are constructed
    with ``shard=(process_index, process_count)`` so each host loads a
    disjoint slice of the index space — assembled into the global
    batch-sharded array via ``jax.make_array_from_process_local_data``.
    A plain device_put there would treat every host's local batch as the
    identical global array (wrong batches, wrong gradients).
    """
    sharding = replicated(mesh) if replicate else batch_sharding(mesh)
    multiprocess = jax.process_count() > 1
    if multiprocess and replicate:
        # Replicated placement has no well-defined multi-host meaning when
        # each process loaded different rows; refuse loudly rather than
        # train on silently host-divergent "replicated" batches. (4D
        # multi-host wants the outer batch sharded over hosts instead.)
        raise NotImplementedError(
            "replicate=True batches are single-host only: on a multi-process "
            "mesh each host holds different local rows, so a replicated "
            "device_put would silently disagree across hosts")
    out = {}
    for key, value in batch.items():
        if hasattr(value, "shape") and getattr(value, "ndim", 0) >= 1:
            if multiprocess:
                out[key] = jax.make_array_from_process_local_data(
                    sharding, value)
            else:
                out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


# Megatron-style tensor-parallel rules for the ViT blocks, keyed on the last
# two path components of each leaf. kernel layouts are (in, out) — column-
# parallel shards `out`, row-parallel shards `in`. A leading stacked-depth
# axis (lax.scan layout) shifts the dims by one, handled by ndim below.
_TP_RULES = {
    ("qkv", "kernel"): "col",
    ("attn_out", "kernel"): "row",
    ("fc1", "kernel"): "col",
    ("fc1", "bias"): "col_bias",
    ("fc2", "kernel"): "row",
    # int8 serving tree (ops/int8_serving.quantize_blocks renames the GEMM
    # weights to *_q8 {"w", "scale", "bias"?}): each q8 weight shards like
    # its bf16 counterpart; the per-output-column scales (shape [.., 1, N])
    # and the col-parallel fc1 bias shard with the output dim, while
    # row-parallel entries keep their scale/bias replicated (their output
    # dim stays whole). Without these, a TP-meshed int8 Predictor silently
    # replicated every quantized weight (round-3 review finding).
    ("qkv_q8", "w"): "col",
    ("qkv_q8", "scale"): "col_bias",
    ("attn_out_q8", "w"): "row",
    ("fc1_q8", "w"): "col",
    ("fc1_q8", "scale"): "col_bias",
    ("fc1_q8", "bias"): "col_bias",
    ("fc2_q8", "w"): "row",
}


def _leaf_spec(path, leaf, tp: bool, pp: bool) -> P:
    names = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
    rule = _TP_RULES.get(names[-2:]) if tp else None
    # Pipeline: stacked per-block params (leading depth axis) live on the
    # stage that runs them — axis 0 over PIPE, matching the shard_map
    # in_spec in parallel/pipeline.py (no resharding at the manual-region
    # boundary, and the optimizer state for the blocks shards with them).
    lead = PIPE_AXIS if (pp and "blocks" in names) else None
    nd = leaf.ndim
    spec = [lead] + [None] * (nd - 1)
    if rule in ("col", "col_bias"):   # shard output dim (last)
        spec[-1] = MODEL_AXIS
    elif rule == "row":               # shard input dim (second-to-last)
        spec[-2] = MODEL_AXIS
    if all(s is None for s in spec):  # canonical replicated form
        return P()
    return P(*spec)


def param_shardings(params: Dict[str, Any], mesh: Mesh,
                    tensor_parallel: bool = True) -> Dict[str, Any]:
    """NamedSharding pytree for the model params.

    With model and pipe axes of size 1 (or tensor_parallel=False)
    everything is replicated; otherwise ViT attention/MLP weights are
    split over MODEL_AXIS and stacked block params over PIPE_AXIS.
    """
    tp = tensor_parallel and mesh.shape[MODEL_AXIS] > 1
    pp = mesh.shape.get(PIPE_AXIS, 1) > 1
    if not tp and not pp:
        return jax.tree.map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, tp, pp)),
        params)


def place_opt_state(opt_state, params, p_shard, mesh):
    """Device-place an optax state with moments matching the param shardings.

    Optimizer moments / gradient accumulators are params-shaped subtrees
    buried inside arbitrary wrapper states (MultiSteps -> chain -> masked ->
    inject_hyperparams here, training/optim.py); replicating them would
    forfeit the memory split of TP/pipe-sharded params (the Adam moments are
    2x the param bytes). Walk the state: any subtree whose structure matches
    ``params`` (treating optax.MaskedNode placeholders as leaves) takes the
    param shardings leaf-for-leaf; everything else (step counts,
    hyperparams) replicates.
    """
    import optax

    p_treedef = jax.tree.structure(params)
    is_masked = lambda x: isinstance(x, optax.MaskedNode)  # noqa: E731
    rep = replicated(mesh)

    def try_params_shaped(node):
        try:
            td = jax.tree.structure(node, is_leaf=is_masked)
        except Exception:
            return None
        if td != p_treedef:
            return None
        return jax.tree.map(
            lambda leaf, s: leaf if is_masked(leaf)
            else jax.device_put(leaf, s),
            node, p_shard, is_leaf=is_masked)

    def place(node):
        hit = try_params_shaped(node)
        if hit is not None:
            return hit
        if isinstance(node, dict):
            return {k: place(v) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[place(v) for v in node])
        if isinstance(node, (tuple, list)):
            return type(node)(place(v) for v in node)
        if is_masked(node):
            return node
        return jax.device_put(node, rep)

    return place(opt_state)
