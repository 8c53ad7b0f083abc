"""G3D-ViT Grad-CAM: attention-gradient class activation maps, hook-free.

Re-implements the reference's ``NeuroEncoder.get_attention_map`` /
``visualize_slice`` (``src/models/NeuroEncoder.py:84-168``) and the plotting
driver (``explainability/xAi_gradcam_ViT3D/gradcam3DViT_fmris.py``).

The reference captures the LayerNorm activations inside the last attention
block with forward/backward hooks and a one-hot ``backward()``
(NeuroEncoder.py:70-82,94-98). Hooks don't exist in functional JAX — instead
the ViT forward exposes a **probe**: a zeros tensor added exactly at that
LayerNorm output. ``jax.vjp`` w.r.t. the probe yields the hook gradients;
the forward returns the activations. The whole CAM pipeline (weights = grad
mean over features, weighted activation sum, CLS drop, reshape to the patch
grid, ReLU, min-max norm, percentile threshold, trilinear upsample —
NeuroEncoder.py:103-131) runs as one jitted function on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def token_grid_to_volume(cam: jax.Array) -> jax.Array:
    """[B, *token_grid] -> [B, *volume] axis order for a 3D patch-grid CAM.

    The encoder permutes the [B, X, Y, Z] input volume to [B, 1, Z, X, Y]
    before patchify (neuro_encoder.py:123), so a token-grid CAM is
    (z, x, y)-ordered; rendering it onto the volume needs the inverse
    permute. DELIBERATE DEVIATION from the reference, which reshapes the
    token CAM straight onto the volume (NeuroEncoder.py:117-131) and
    therefore overlays an axis-permuted map — measured on the trained
    synthetic cube task, the localization score by rendering permutation is
    (1,2,0): 16/16 vs identity: 7/16 for the reference's own CAM formula
    (tests/test_cam_methods.py::test_methods_localize_cube_after_training
    pins the corrected rendering; the ResNet CAM path always permuted back,
    gradcam_resnet.py:70-72). Explanation-only: no training/inference
    behavior changes.
    """
    return cam.transpose(0, 2, 3, 1)


def finalize_cam(cam: jax.Array, grid: int, threshold: float) -> jax.Array:
    """Shared CAM tail (NeuroEncoder.py:117-131): ReLU -> per-sample min-max
    norm -> percentile threshold -> trilinear upsample to [B, grid^3].

    ``cam``: [B, cs, cs, cs] raw (possibly signed) patch-grid map.
    All normalization reductions are PER SAMPLE: the reference runs with
    B=1 (NeuroEncoder.py:118-123), so its global min/max/percentile ARE
    per-sample — a batched call must not couple samples through shared
    statistics.
    """
    return finalize_cam_nd(cam, (grid, grid, grid), threshold,
                           method="trilinear")


def finalize_cam_nd(cam: jax.Array, out_shape, threshold: float,
                    method: str) -> jax.Array:
    """Rank-agnostic CAM tail: [B, *patch_grid] -> [B, *out_shape].

    Shared by the 3D menu and the 2D tutorial workflow (vit_cam_2d) so the
    normalization/threshold semantics can't silently diverge between the
    two (review r3)."""
    b = cam.shape[0]
    axes = tuple(range(1, cam.ndim))
    cam = jax.nn.relu(cam)
    cam_min = cam.min(axis=axes, keepdims=True)
    cam_max = cam.max(axis=axes, keepdims=True)
    cam = (cam - cam_min) / (cam_max - cam_min + 1e-8)         # (…:120)
    # Keep the top `threshold`% voxels (np.percentile(cam, 100-t), …:121-123).
    flat = cam.reshape(b, -1)
    threshold_value = jnp.percentile(
        flat, 100.0 - threshold,
        axis=1).reshape((b,) + (1,) * len(axes))
    cam = jnp.where(cam >= threshold_value, cam, 0.0)
    # Half-pixel-centered upsample == F.interpolate(mode='trilinear'/
    # 'bilinear', align_corners=False) (…:126-131).
    return jax.image.resize(cam, (b,) + tuple(out_shape), method=method)


def probe_acts_grads(model, params: Dict, x: jax.Array):
    """One vjp-probe forward: (logits, class_idx, activations, gradients).

    ``activations``/``gradients`` are the last attention block's LayerNorm
    output and its gradient w.r.t. the argmax-class logit — the reference's
    forward/backward hook captures (NeuroEncoder.py:70-82,94-98), shape
    [B, num_patches+1, dim] (CLS token included).
    """
    n_tokens = model.vit_cfg.num_patches + 1
    b = x.shape[0]
    probe_zero = jnp.zeros((b, n_tokens, model.vit_cfg.dim), jnp.float32)

    def fwd(shift):
        logits, aux = model.apply(params, x, deterministic=True,
                                  probe_shift=shift)
        return logits, aux["probe"].astype(jnp.float32)

    (logits, activations), vjp_fn = jax.vjp(fwd, probe_zero)
    class_idx = jnp.argmax(logits, axis=1)
    one_hot = jax.nn.one_hot(class_idx, logits.shape[-1], dtype=logits.dtype)
    (gradients,) = vjp_fn((one_hot, jnp.zeros_like(activations)))
    return logits, class_idx, activations, gradients


@partial(jax.jit, static_argnums=(0,))
def _attention_map_jit(model, params: Dict, x: jax.Array,
                       threshold: float) -> Tuple[jax.Array, jax.Array]:
    """x: [B, H, W, D] -> (cam [B, grid, grid, grid] f32, class_idx [B])."""
    grid = model.vit_cfg.image_size
    patch = model.vit_cfg.image_patch_size
    b = x.shape[0]
    _, class_idx, activations, gradients = probe_acts_grads(model, params, x)

    # Grad-CAM weights: mean gradient over the feature dim (NeuroEncoder.py:103).
    weights = jnp.mean(gradients, axis=2, keepdims=True)
    cam = jnp.sum(weights * activations, axis=2)      # [B, tokens]
    cam = cam[:, 1:]                                  # drop CLS (…:112)
    cs = grid // patch
    cam = token_grid_to_volume(cam.reshape(b, cs, cs, cs))
    cam_3d = finalize_cam(cam, grid, threshold)
    return cam_3d, class_idx


def get_attention_map(model, variables: Dict, x, threshold: float = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """API parity with NeuroEncoder.get_attention_map (x: [B,H,W,D]).

    Returns (cam_3d, class_idx); for B=1 the cam is squeezed to [grid]^3,
    matching the reference's ``.squeeze()``. ``threshold`` overrides the
    config's GRADCAM_THRESHOLD (percent of voxels kept).
    """
    params = variables["params"] if "params" in variables else variables
    if threshold is None:
        threshold = float(model.config["GRADCAM_THRESHOLD"])
    x = jnp.asarray(x, jnp.float32)
    squeeze = False
    if x.ndim == 3:
        x, squeeze = x[None], True
    cam, class_idx = _attention_map_jit(model, params, x, float(threshold))
    cam = np.asarray(cam)
    if squeeze or cam.shape[0] == 1:
        cam = cam[0]
    return cam, np.asarray(class_idx)


def reshape_transform(tokens, depth: int, height: int, width: int,
                      slice_idx: int = None):
    """ViT token stream -> CNN-style 2D feature map, for CAM methods that
    expect [B, C, H, W] activations (the reference's helper,
    ``explainability/xAi_gradcam_Resnet3D/gradcam_sMRI.py:16-29``): drop the
    CLS token, fold the remaining tokens into the (depth, height, width)
    patch grid, take one depth slice (the middle one by default — the
    reference hardcodes 45 of 91), and move channels first."""
    tokens = jnp.asarray(tokens)
    b, _, dim = tokens.shape
    grid = tokens[:, 1:, :].reshape(b, depth, height, width, dim)
    if slice_idx is None:
        slice_idx = depth // 2
    return grid[:, slice_idx].transpose(0, 3, 1, 2)     # [B, dim, h, w]


def visualize_slice(config: Dict, cam_3d, original_volume):
    """Extract the (image, attention) slice pair along GRADCAM_SLICE_DIM at
    GRADCAM_SLICE_IDX (NeuroEncoder.py:135-168)."""
    slice_dim = config["GRADCAM_SLICE_DIM"]
    slice_idx = config["GRADCAM_SLICE_IDX"]
    if cam_3d is None:
        print("Error: No CAM computed")
        return None
    original = np.asarray(original_volume).squeeze()
    cam_3d = np.asarray(cam_3d)
    if original.ndim != 3 or cam_3d.ndim != 3:
        print(f"Shape mismatch: original {original.shape}, CAM {cam_3d.shape}")
        return None
    if slice_dim == 0:      # Sagittal
        return original[slice_idx], cam_3d[slice_idx]
    if slice_dim == 1:      # Coronal
        return original[:, slice_idx], cam_3d[:, slice_idx]
    if slice_dim == 2:      # Axial
        return original[:, :, slice_idx], cam_3d[:, :, slice_idx]
    print(f"Invalid slice dimension: {slice_dim}")
    return None
