"""ResNet CAMs: GradCAM / GradCAM-elementwise / LayerCAM on layer4.

Replaces the reference's pytorch_grad_cam usage
(``explainability/xAi_gradcam_Resnet3D/gradcam.py:8,29-30``: LayerCAM — with
GradCAM and GradCAMElementWise imported as alternatives — targeting
``resnet.layer4[-1]``). Feature activations and their gradients come from the
3D ResNet's layer4 probe (see ``models/resnet3d.apply(feature_shift=...)``)
via ``jax.vjp`` — no hooks — and the CAM pipeline (channel weighting, ReLU,
per-sample min-max normalization, trilinear upsample to the input volume)
runs jitted on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.models import resnet3d

METHODS = ("gradcam", "gradcam_elementwise", "layercam")


@partial(jax.jit, static_argnums=(0, 1))
def _resnet_cam_jit(model, method: str, params: Dict, state: Dict,
                    x: jax.Array):
    """x: [B, H, W, D] -> (cam [B, H, W, D] in [0, 1], class_idx [B])."""
    cfg = model.resnet_cfg
    vol = x.transpose(0, 3, 1, 2)[:, None].astype(model.compute_dtype)

    # Shape probe: run once to get the layer4 feature shape.
    _, _, feats = resnet3d.apply(
        params["volume_encoder"], state["volume_encoder"], vol, cfg,
        train=False, capture_features=True)
    zeros = jnp.zeros(feats.shape, jnp.float32)

    def fwd(shift):
        logits, _, features = resnet3d.apply(
            params["volume_encoder"], state["volume_encoder"], vol,
            cfg, train=False, capture_features=True, feature_shift=shift)
        return logits, features.astype(jnp.float32)

    (logits, activations), vjp_fn = jax.vjp(fwd, zeros)
    class_idx = jnp.argmax(logits, axis=1)
    one_hot = jax.nn.one_hot(class_idx, logits.shape[-1], dtype=logits.dtype)
    (grads,) = vjp_fn((one_hot, jnp.zeros_like(activations)))

    if method == "gradcam":
        # channel weights = spatial mean of gradients
        w = jnp.mean(grads, axis=(2, 3, 4), keepdims=True)
        cam = jnp.sum(w * activations, axis=1)
    elif method == "gradcam_elementwise":
        cam = jnp.sum(jax.nn.relu(grads * activations), axis=1)
    elif method == "layercam":
        cam = jnp.sum(jax.nn.relu(grads) * activations, axis=1)
    else:
        raise ValueError(f"unknown CAM method {method}")

    cam = jax.nn.relu(cam)                              # [B, d, h, w]
    flat = cam.reshape(cam.shape[0], -1)
    lo = flat.min(axis=1)[:, None, None, None]
    hi = flat.max(axis=1)[:, None, None, None]
    cam = (cam - lo) / (hi - lo + 1e-8)
    b = cam.shape[0]
    h, w, d = x.shape[1], x.shape[2], x.shape[3]
    # features are [B, C, D', H', W'] -> cam [B, D', H', W']; resize then
    # permute back to the volume's [H, W, D] convention.
    cam = jax.image.resize(cam, (b, d, h, w), method="trilinear")
    cam = cam.transpose(0, 2, 3, 1)
    return cam, class_idx


def resnet_cam(model, variables: Dict, x, method: str = "layercam"
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Public API. x: [H,W,D] or [B,H,W,D]; LayerCAM by default, matching the
    reference's active choice (gradcam.py:30)."""
    assert method in METHODS
    params = variables["params"]
    state = variables["state"]
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    cam, cls = _resnet_cam_jit(model, method, params, state, x)
    cam = np.asarray(cam)
    return (cam[0] if squeeze else cam), np.asarray(cls)
