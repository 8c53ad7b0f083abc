"""Torch-style state-dict export/import for cross-framework parity.

The reference checkpoints are bare ``torch.save(model.state_dict())`` files
(``src/Trainer.py:54-55``) and are loaded with ``strict=False`` everywhere
(``main.py:166-170``) plus ``volume_encoder.vit3d.`` key-prefix filtering for
the 4D bootstrap (``NeuroEncoder.py:25-32``). This module maps our parameter
pytrees to/from flat dicts with the **reference's exact torch key names and
layouts** (torch Linear weights are (out, in); ours are (in, out)), so:

- parity tests can copy weights between the torch reference model and ours,
- 4D mode can bootstrap its frozen encoder from a 3D-run checkpoint with the
  same key filtering semantics,
- users migrating from the reference can convert checkpoints.

Serialization is a pickle of {torch_key: np.ndarray} — loadable without
torch. ``load_into`` implements strict/non-strict merge semantics.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

# Each entry: (torch_key, path, transpose) where path addresses our pytree;
# an integer in the path indexes the stacked block axis.
Entry = Tuple[str, Tuple, bool]


def _vit_entries(depth: int, project_out: bool,
                 prefix: str = "volume_encoder.vit3d.") -> List[Entry]:
    e: List[Entry] = [
        (f"{prefix}to_patch_embedding.1.weight",
         ("patch_embed", "norm_pre", "scale"), False),
        (f"{prefix}to_patch_embedding.1.bias",
         ("patch_embed", "norm_pre", "bias"), False),
        (f"{prefix}to_patch_embedding.2.weight",
         ("patch_embed", "proj", "kernel"), True),
        (f"{prefix}to_patch_embedding.2.bias",
         ("patch_embed", "proj", "bias"), False),
        (f"{prefix}to_patch_embedding.3.weight",
         ("patch_embed", "norm_post", "scale"), False),
        (f"{prefix}to_patch_embedding.3.bias",
         ("patch_embed", "norm_post", "bias"), False),
        (f"{prefix}pos_embedding", ("pos_embedding",), False),
        (f"{prefix}cls_token", ("cls_token",), False),
        (f"{prefix}mlp_head.0.weight", ("head", "norm", "scale"), False),
        (f"{prefix}mlp_head.0.bias", ("head", "norm", "bias"), False),
        (f"{prefix}mlp_head.1.weight", ("head", "fc", "kernel"), True),
        (f"{prefix}mlp_head.1.bias", ("head", "fc", "bias"), False),
    ]
    for i in range(depth):
        lp = f"{prefix}transformer.layers.{i}."
        e += [
            (f"{lp}0.norm.weight", ("blocks", "attn_norm", "scale", i), False),
            (f"{lp}0.norm.bias", ("blocks", "attn_norm", "bias", i), False),
            (f"{lp}0.to_qkv.weight", ("blocks", "qkv", "kernel", i), True),
            (f"{lp}1.net.0.weight", ("blocks", "mlp_norm", "scale", i), False),
            (f"{lp}1.net.0.bias", ("blocks", "mlp_norm", "bias", i), False),
            (f"{lp}1.net.1.weight", ("blocks", "fc1", "kernel", i), True),
            (f"{lp}1.net.1.bias", ("blocks", "fc1", "bias", i), False),
            (f"{lp}1.net.4.weight", ("blocks", "fc2", "kernel", i), True),
            (f"{lp}1.net.4.bias", ("blocks", "fc2", "bias", i), False),
        ]
        if project_out:
            e += [
                (f"{lp}0.to_out.0.weight",
                 ("blocks", "attn_out", "kernel", i), True),
                (f"{lp}0.to_out.0.bias",
                 ("blocks", "attn_out", "bias", i), False),
            ]
    return e


def _temporal_entries() -> List[Entry]:
    # nn.TransformerEncoder(..., num_layers=1) (NeuroEncoder.py:211-212).
    tp = "temporal_transformer.transformer.layers.0."
    return [
        (f"{tp}self_attn.in_proj_weight",
         ("temporal", "layer0", "in_proj", "kernel"), True),
        (f"{tp}self_attn.in_proj_bias",
         ("temporal", "layer0", "in_proj", "bias"), False),
        (f"{tp}self_attn.out_proj.weight",
         ("temporal", "layer0", "out_proj", "kernel"), True),
        (f"{tp}self_attn.out_proj.bias",
         ("temporal", "layer0", "out_proj", "bias"), False),
        (f"{tp}linear1.weight", ("temporal", "layer0", "fc1", "kernel"), True),
        (f"{tp}linear1.bias", ("temporal", "layer0", "fc1", "bias"), False),
        (f"{tp}linear2.weight", ("temporal", "layer0", "fc2", "kernel"), True),
        (f"{tp}linear2.bias", ("temporal", "layer0", "fc2", "bias"), False),
        (f"{tp}norm1.weight", ("temporal", "layer0", "norm1", "scale"), False),
        (f"{tp}norm1.bias", ("temporal", "layer0", "norm1", "bias"), False),
        (f"{tp}norm2.weight", ("temporal", "layer0", "norm2", "scale"), False),
        (f"{tp}norm2.bias", ("temporal", "layer0", "norm2", "bias"), False),
        ("projection_head.projection_head.weight",
         ("projection", "kernel"), True),
        ("projection_head.projection_head.bias",
         ("projection", "bias"), False),
    ]


def _model_entries(model) -> List[Entry]:
    """Entries for a NeuroEncoder's full pytree (ViT encoder kind)."""
    if model.encoder_kind != "vit":
        raise NotImplementedError(
            "state-dict interop is defined for the ViT encoder "
            "(the reference's resnet wiring is vestigial, NeuroEncoder.py:21)")
    entries = [(k, ("volume_encoder",) + path, t)
               for k, path, t in _vit_entries(model.vit_cfg.depth,
                                              model.vit_cfg.project_out)]
    if model.is_4d:
        entries += _temporal_entries()
    return entries


def _tree_get(tree, path):
    node = tree
    block_idx = None
    for p in path:
        if isinstance(p, int):
            block_idx = p
            continue
        node = node[p]
    if block_idx is not None:
        node = node[block_idx]
    return node


def _tree_set(tree, path, value):
    """Immutable set along a nested-dict path (int = stacked block index)."""
    keys = [p for p in path if not isinstance(p, int)]
    idxs = [p for p in path if isinstance(p, int)]

    def rec(node, depth):
        if depth == len(keys):
            if idxs:
                return jnp.asarray(node).at[idxs[0]].set(jnp.asarray(value))
            return jnp.asarray(value)
        k = keys[depth]
        new = dict(node)
        new[k] = rec(node[k], depth + 1)
        return new

    return rec(tree, 0)


def to_state_dict(model, params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export params as a torch-key flat dict (torch layouts)."""
    out = {}
    for key, path, transpose in _model_entries(model):
        arr = np.asarray(_tree_get(params, path))
        out[key] = arr.T if transpose else arr
    return out


def load_into(model, params: Dict[str, Any], state_dict: Dict[str, np.ndarray],
              strict: bool = False, prefix_filter: Optional[str] = None,
              strip_prefix: Optional[str] = None) -> Dict[str, Any]:
    """Merge a torch-key state dict into a params pytree.

    strict=False skips missing/unknown keys (reference main.py:166-170);
    ``prefix_filter``/``strip_prefix`` implement the 4D bootstrap filtering
    (keep keys starting with ``volume_encoder.vit3d.``, NeuroEncoder.py:27-31).
    """
    sd = dict(state_dict)
    if prefix_filter is not None:
        sd = {k: v for k, v in sd.items() if k.startswith(prefix_filter)}
    if strip_prefix is not None:
        sd = {k[len(strip_prefix):] if k.startswith(strip_prefix) else k: v
              for k, v in sd.items()}
    entries = {k: (path, t) for k, path, t in _model_entries(model)}
    matched = set()
    for key, value in sd.items():
        if key not in entries:
            if strict:
                raise KeyError(f"Unexpected key in state_dict: {key}")
            continue
        path, transpose = entries[key]
        arr = np.asarray(value)
        if transpose:
            arr = arr.T
        expected = np.asarray(_tree_get(params, path)).shape
        if arr.shape != expected:
            raise ValueError(f"Shape mismatch for {key}: "
                             f"checkpoint {arr.shape} vs model {expected}")
        params = _tree_set(params, path, arr)
        matched.add(key)
    if strict:
        missing = set(entries) - matched
        if missing:
            raise KeyError(f"Missing keys in state_dict: {sorted(missing)}")
    return params


def save(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    with open(path, "wb") as f:
        pickle.dump({k: np.asarray(v) for k, v in state_dict.items()}, f)


def load(path: str) -> Dict[str, np.ndarray]:
    """Load a flat numpy state dict — our pickle format, or a real PyTorch
    ``.pth`` (zip) file via the torch-free reader (torch_pth.py), so
    reference checkpoints import directly."""
    import zipfile
    if zipfile.is_zipfile(path):
        from neurovit_tpu.training.torch_pth import load_torch_state_dict
        return load_torch_state_dict(path)
    with open(path, "rb") as f:
        return pickle.load(f)
