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

Serialization is torch.save's zip format, written and read without torch
(torch_pth.py) — checkpoints flow BOTH ways between this framework and the
reference's torch tooling. Legacy runs that saved the old numpy pickle
still load (the reader sniffs the container). ``load_into`` implements
strict/non-strict merge semantics.
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


def _bn_entries(torch_prefix: str, p_path: Tuple, s_path: Tuple
                ) -> List[Entry]:
    """BatchNorm3d: affine params + running stats (state subtree).
    ``num_batches_tracked`` is synthesized on export / ignored on import."""
    return [
        (f"{torch_prefix}.weight", p_path + ("scale",), False),
        (f"{torch_prefix}.bias", p_path + ("bias",), False),
        (f"{torch_prefix}.running_mean", s_path + ("mean",), False),
        (f"{torch_prefix}.running_var", s_path + ("var",), False),
    ]


def _resnet_entries(cfg, prefix: str = "resnet_3d.resnet.") -> List[Entry]:
    """3D ResNet entries over the combined {"params", "state"} tree.

    Torch key names follow the reference's Kensho-Hara module layout
    (``src/models/resnet_3d.py:116-176``: conv1/bn1, layer{1..4}.{b} blocks
    with conv{1,2[,3]}/bn{1,2[,3]}/downsample.{0,1}, fc) under the older-
    revision NeuroEncoder attribute path the explainability scripts load
    (``model.resnet_3d.resnet``, xAi_gradcam_Resnet3D/gradcam.py:29).
    Conv kernels are OIDHW on both sides — no transpose; Linear transposes.
    """
    pv = ("params", "volume_encoder")
    sv = ("state", "volume_encoder")
    e: List[Entry] = [(f"{prefix}conv1.weight", pv + ("conv1", "kernel"), False)]
    e += _bn_entries(f"{prefix}bn1", pv + ("bn1",), sv + ("bn1",))
    n_convs = 2 if cfg.block_kind == "basic" else 3
    in_planes = cfg.stage_planes[0]
    for s in range(4):
        planes = cfg.stage_planes[s]
        out_planes = planes * cfg.expansion
        for b in range(cfg.stage_blocks[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            tp = f"{prefix}layer{s + 1}.{b}."
            pb = pv + (f"layer{s + 1}", b)
            sb = sv + (f"layer{s + 1}", b)
            for c in range(1, n_convs + 1):
                e.append((f"{tp}conv{c}.weight",
                          pb + (f"conv{c}", "kernel"), False))
                e += _bn_entries(f"{tp}bn{c}", pb + (f"bn{c}",),
                                 sb + (f"bn{c}",))
            if (stride != 1 or in_planes != out_planes) \
                    and cfg.shortcut_type == "B":
                e.append((f"{tp}downsample.0.weight",
                          pb + ("ds_conv", "kernel"), False))
                e += _bn_entries(f"{tp}downsample.1", pb + ("ds_bn",),
                                 sb + ("ds_bn",))
            in_planes = out_planes
    e += [(f"{prefix}fc.weight", pv + ("fc", "kernel"), True),
          (f"{prefix}fc.bias", pv + ("fc", "bias"), False)]
    return e


def _model_entries(model) -> List[Entry]:
    """Entries for a NeuroEncoder's combined {"params", "state"} tree."""
    if model.encoder_kind == "resnet":
        entries = _resnet_entries(model.resnet_cfg)
    else:
        entries = [(k, ("params", "volume_encoder") + path, t)
                   for k, path, t in _vit_entries(model.vit_cfg.depth,
                                                  model.vit_cfg.project_out,
                                                  prefix="volume_encoder.vit3d.")]
    if model.is_4d:
        entries += [(k, ("params",) + path, t)
                    for k, path, t in _temporal_entries()]
    return entries


def _tree_get(tree, path):
    node = tree
    for i, p in enumerate(path):
        if isinstance(p, int) and not isinstance(node, (list, tuple)):
            # Stacked-depth axis of a lax.scan parameter array (ViT blocks):
            # must be the final path component.
            assert i == len(path) - 1
            return node[p]
        node = node[p]
    return node


def _tree_set(tree, path, value):
    """Immutable set along a path of dict keys / list indices; an int hitting
    an array leaf indexes the stacked lax.scan depth axis."""

    def rec(node, i):
        if i == len(path):
            return jnp.asarray(value)
        p = path[i]
        if isinstance(p, int) and not isinstance(node, (list, tuple)):
            assert i == len(path) - 1
            return jnp.asarray(node).at[p].set(jnp.asarray(value))
        if isinstance(node, (list, tuple)):
            new = list(node)
            new[p] = rec(node[p], i + 1)
            return new
        new = dict(node)
        new[p] = rec(node[p], i + 1)
        return new

    return rec(tree, 0)


def _combined(model, params, model_state):
    if model.encoder_kind == "resnet" and model_state is None:
        raise ValueError(
            "resnet state-dict interop needs the BN running stats: pass "
            "model_state (the train state's 'model_state' / variables "
            "'state' subtree)")
    return {"params": params, "state": model_state if model_state is not None
            else {}}


def to_state_dict(model, params: Dict[str, Any],
                  model_state: Optional[Dict[str, Any]] = None
                  ) -> Dict[str, np.ndarray]:
    """Export params (+ BN state for resnet) as a torch-key flat dict."""
    tree = _combined(model, params, model_state)
    out = {}
    for key, path, transpose in _model_entries(model):
        arr = np.asarray(_tree_get(tree, path))
        out[key] = arr.T if transpose else arr
    # Torch BN modules also carry a step counter; synthesize it so a real
    # torch load_state_dict(strict=True) accepts the export.
    for key in [k for k in out if k.endswith(".running_mean")]:
        out[key[: -len("running_mean")] + "num_batches_tracked"] = \
            np.asarray(0, np.int64)
    return out


def load_into_variables(model, variables: Dict[str, Any],
                        state_dict: Dict[str, np.ndarray],
                        strict: bool = False,
                        prefix_filter: Optional[str] = None,
                        strip_prefix: Optional[str] = None) -> Dict[str, Any]:
    """Merge a torch-key state dict into {"params", "state"} variables.

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
    model_state = variables.get("state")
    state_missing = model_state is None
    tree = {"params": variables["params"],
            "state": {} if state_missing else model_state}
    entries = {k: (path, t) for k, path, t in _model_entries(model)}
    matched = set()
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue  # torch BN step counter; no equivalent here
        if key not in entries:
            if strict:
                raise KeyError(f"Unexpected key in state_dict: {key}")
            continue
        path, transpose = entries[key]
        if path[0] == "state" and state_missing:
            # Params-only caller (load_into): BN running stats have nowhere
            # to land. strict=False skips them (torch strict=False
            # semantics); strict demands the full variables form.
            if strict:
                raise ValueError(
                    f"{key} targets the model state (BN running stats) but "
                    f"no state subtree was provided — use "
                    f"load_into_variables for resnet checkpoints")
            continue
        arr = np.asarray(value)
        if transpose:
            arr = arr.T
        expected = np.asarray(_tree_get(tree, path)).shape
        if arr.shape != expected:
            raise ValueError(f"Shape mismatch for {key}: "
                             f"checkpoint {arr.shape} vs model {expected}")
        tree = _tree_set(tree, path, arr)
        matched.add(key)
    if strict:
        missing = set(entries) - matched
        if missing:
            raise KeyError(f"Missing keys in state_dict: {sorted(missing)}")
    return {**variables, "params": tree["params"], "state": tree["state"]}


def load_into(model, params: Dict[str, Any], state_dict: Dict[str, np.ndarray],
              strict: bool = False, prefix_filter: Optional[str] = None,
              strip_prefix: Optional[str] = None) -> Dict[str, Any]:
    """Params-only merge (ViT encoder — no BN state). See
    ``load_into_variables`` for the general form resnet checkpoints need."""
    out = load_into_variables(
        model, {"params": params, "state": None}, state_dict,
        strict=strict, prefix_filter=prefix_filter, strip_prefix=strip_prefix)
    return out["params"]


def save(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Write the flat state dict in torch.save's zip format (torch_pth.py
    writer, no torch needed), so the artifact opens under ``torch.load``
    in the reference's own tooling AND under :func:`load` here."""
    from neurovit_tpu.training.torch_pth import save_torch_state_dict
    save_torch_state_dict(path, {k: np.asarray(v)
                                 for k, v in state_dict.items()})


class _NumpyRestrictedUnpickler(pickle.Unpickler):
    """Admits exactly the callables a flat ``{str: np.ndarray}`` pickle
    (the legacy save format of older runs of this framework) reconstructs
    through — nothing else. Checkpoints are untrusted input; the torch
    formats go through ``torch_pth._RestrictedUnpickler`` and this closes
    the same door on the numpy fallback (a plain malicious pickle must not
    reach an unrestricted ``pickle.load``)."""

    _ALLOWED = {
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "_reconstruct"),   # numpy >= 2 module path
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.multiarray", "scalar"),
        ("numpy", "ndarray"),
        ("numpy", "dtype"),
        ("collections", "OrderedDict"),
    }

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"{module}.{name} is not allowed in checkpoint files")


def load(path: str) -> Dict[str, np.ndarray]:
    """Load a flat numpy state dict — torch zip format (what :func:`save`
    writes and the reference's ``torch.save`` produces) or the pre-1.6
    legacy torch pickle-stream format, both via the torch-free reader, or
    the legacy numpy pickle older runs of this framework saved. Every
    branch unpickles through a restricted unpickler — a checkpoint file is
    untrusted input and must never reach unrestricted ``pickle.load``."""
    import zipfile

    from neurovit_tpu.training import torch_pth
    if zipfile.is_zipfile(path):
        return torch_pth.load_torch_state_dict(path)
    # Probe the first pickle with the torch restricted unpickler: the
    # pre-1.6 stream opens with a bare magic int (no classes needed), and
    # this framework's legacy numpy pickles fail its find_class cleanly.
    with open(path, "rb") as f:
        try:
            first = torch_pth._RestrictedUnpickler(f).load()
        except pickle.UnpicklingError:
            first = None
    if first == torch_pth._LEGACY_MAGIC:
        # Pre-1.6 torch stream: the first pickle is the magic number, the
        # state dict follows with persistent-id storages.
        return torch_pth.load_torch_state_dict(path)
    with open(path, "rb") as f:
        return _NumpyRestrictedUnpickler(f).load()
