"""CAM method menu for the 3D ViT: gradcam++/xgradcam/layercam/eigencam/
eigengradcam/scorecam/ablationcam on the Grad-CAM probe layer.

The reference vendors the upstream pytorch_grad_cam ViT tutorial
(``explainability/activation_map/gradcam_original.py``) whose whole point is
a *menu* of CAM methods over a ViT target layer with a ``reshape_transform``
(gradcam_original.py:59-68,73). This module provides that method menu
natively for the framework's own 3D ViT (the tutorial's 2D image workflow
itself lives in the sibling ``vit_cam_2d`` module): every
method consumes the (activations, gradients) that the hook-free vjp probe
already exposes (``gradcam_vit3d.probe_acts_grads`` — the analog of the
tutorial's ``model.blocks[-1].norm1`` target layer), computes its token-space
map, and shares the reference CAM tail (ReLU -> per-sample norm -> percentile
threshold -> trilinear upsample, NeuroEncoder.py:117-131).

Token-space conventions (after dropping the CLS token): activations
``A[b, s, c]`` and target-class gradients ``G[b, s, c]`` over spatial
positions ``s`` (the (grid/patch)^3 patch cells) and channels ``c`` (the
model dim) — exactly the tutorial's reshape_transform view with channels
last.

Methods (pytorch_grad_cam semantics):

- ``gradcam``      w_c = mean_s G;             cam_s = sum_c w_c A
- ``gradcam++``    alpha from the 2nd-order expansion (Chattopadhay 2018)
- ``xgradcam``     w_c = sum_s(G*A)/(sum_s A + eps)
- ``layercam``     cam_s = sum_c relu(G)*A     (position-wise weighting)
- ``eigencam``     1st principal projection of spatially-centered A
- ``eigengradcam`` same, of G*A
- ``scorecam``     gradient-free: w_c = softmax_c score(x * upsample(A_c))
- ``ablationcam``  w_c = (score - score with channel c zeroed at the probe
                   layer) / score — the ablation rides the additive probe
                   (shift = -A[..., c] e_c), no model surgery needed
- ``gradcam-ref``  the reference's own variant (grad mean over *features*,
                   NeuroEncoder.py:103) — delegates to gradcam_vit3d

FullGrad is not reproduced: it decomposes the score into per-layer *bias*
gradients over every norm layer in the network, which is a different capture
contract than the single probe layer all other methods (and the reference's
hooks) share; the tutorial never ran it on the 3D model either.

Method-quality caveat (measured, tests/test_cam_methods.py, with the
volume-order rendering of ``token_grid_to_volume``): the probe layer is a
LayerNorm output — zero-centered and SIGNED — while gradcam/gradcam++/
ablationcam/eigencam were derived for non-negative CNN feature maps. On a
trained cube-task model the robust localizers here are ``gradcam-ref``
(16/16 val samples), ``layercam`` (16/16) and ``scorecam`` (8/8);
``gradcam`` is middling (8/16) and the rest are unreliable on this layer
despite reproducing the upstream formulas exactly (numerically pinned in
tests). This mirrors upstream pytorch_grad_cam behavior on ViTs, where
method choice matters far more than on CNNs.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.explainability.gradcam_vit3d import (finalize_cam,
                                                       probe_acts_grads,
                                                       token_grid_to_volume)

GRAD_METHODS = ("gradcam", "gradcam++", "xgradcam", "layercam",
                "eigencam", "eigengradcam")
FORWARD_METHODS = ("scorecam", "ablationcam")
METHODS = GRAD_METHODS + FORWARD_METHODS + ("gradcam-ref",)


def _principal_projection(x: jax.Array) -> jax.Array:
    """[B, S, C] -> [B, S]: projection onto the first right singular vector
    of the spatially-centered matrix (pytorch_grad_cam get_2d_projection)."""
    centered = x - x.mean(axis=1, keepdims=True)
    # SVD of [S, C] per sample; V[:, 0] spans the dominant channel direction.
    _, _, vt = jnp.linalg.svd(centered, full_matrices=False)
    proj = jnp.einsum("bsc,bc->bs", centered, vt[:, 0, :])
    # Sign is arbitrary per sample; pick the orientation with positive mass
    # (the CAM tail ReLUs, so the wrong sign would zero the whole map).
    sign = jnp.sign(jnp.sum(jax.nn.relu(proj) - jax.nn.relu(-proj),
                            axis=1, keepdims=True))
    return proj * jnp.where(sign == 0, 1.0, sign)


def _token_cam(method: str, acts: jax.Array, grads: jax.Array,
               eigen_smooth: bool = False) -> jax.Array:
    """[B, S, C] activations/gradients -> [B, S] raw token map.

    ``eigen_smooth`` reproduces the tutorial's ``--eigen_smooth`` flag
    (gradcam_original.py:27,96): instead of summing the weighted activations
    over channels, project onto their first principal component
    (pytorch_grad_cam BaseCAM.get_cam_image) — "reduce noise by taking the
    first principle component of cam_weights*activations". The eigen methods
    are already projections and ignore the flag.
    """
    a, g = acts, grads
    if method == "eigencam":
        return _principal_projection(a)
    if method == "eigengradcam":
        return _principal_projection(g * a)
    if method == "gradcam":
        w = g.mean(axis=1, keepdims=True)                      # [B, 1, C]
        weighted = w * a
    elif method == "gradcam++":
        # alpha_sc = g^2 / (2 g^2 + (sum_s A) * g^3): the spatial sum of the
        # activations alone, broadcast against the per-position g^3
        # (Chattopadhay 2018 eq. 19 / pytorch_grad_cam GradCAMPlusPlus).
        g2, g3 = g * g, g * g * g
        denom = 2.0 * g2 + jnp.sum(a, axis=1, keepdims=True) * g3
        alpha = jnp.where(jnp.abs(denom) > 1e-12, g2 / denom, 0.0)
        w = jnp.sum(alpha * jax.nn.relu(g), axis=1, keepdims=True)
        weighted = w * a
    elif method == "xgradcam":
        w = (jnp.sum(g * a, axis=1, keepdims=True)
             / (jnp.sum(a, axis=1, keepdims=True) + 1e-8))
        weighted = w * a
    elif method == "layercam":
        weighted = jax.nn.relu(g) * a
    else:
        raise ValueError(f"unknown gradient CAM method: {method}")
    if eigen_smooth:
        return _principal_projection(weighted)
    return jnp.sum(weighted, axis=2)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _grad_cam_raw_jit(model, params: Dict, x: jax.Array, method: str,
                      eigen_smooth: bool) -> Tuple[jax.Array, jax.Array]:
    """Raw (pre-normalization) patch-grid CAM [B, cs, cs, cs] + class_idx."""
    cs = model.vit_cfg.image_size // model.vit_cfg.image_patch_size
    b = x.shape[0]
    _, class_idx, acts, grads = probe_acts_grads(model, params, x)
    cam = _token_cam(method, acts[:, 1:], grads[:, 1:],        # drop CLS
                     eigen_smooth)
    return token_grid_to_volume(cam.reshape(b, cs, cs, cs)), class_idx


# --------------------------------------------------------------------------
# Forward-only methods (per channel-chunk compiled forwards)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def _probe_forward_jit(model, params, x):
    n_tokens = model.vit_cfg.num_patches + 1
    zeros = jnp.zeros((x.shape[0], n_tokens, model.vit_cfg.dim), jnp.float32)
    logits, aux = model.apply(params, x, deterministic=True, probe_shift=zeros)
    return logits, aux["probe"].astype(jnp.float32)


def _channel_masks_hwd(acts_chunk, cs: int, grid: int):
    """[K, S] token activations -> [K, H, W, D] minmax-normalized input
    masks.

    The token stream is (d, h, w)-ordered (the encoder permutes the
    [B, H, W, D] volume to [B, 1, D, H, W] before patchify,
    neuro_encoder.py:123), while the model's INPUT volumes are [H, W, D] —
    so after upsampling on the token grid the mask must be transposed
    (d, h, w) -> (h, w, d) before it can multiply the input."""
    k = acts_chunk.shape[0]
    masks = acts_chunk.reshape(k, cs, cs, cs)                  # (k, d, h, w)
    masks = jax.image.resize(masks, (k, grid, grid, grid), method="trilinear")
    masks = masks.transpose(0, 2, 3, 1)                        # (k, h, w, d)
    lo = masks.min(axis=(1, 2, 3), keepdims=True)
    hi = masks.max(axis=(1, 2, 3), keepdims=True)
    return (masks - lo) / (hi - lo + 1e-8)


@partial(jax.jit, static_argnums=(0, 4))
def _scorecam_chunk_jit(model, params, x1, acts_chunk, grid):
    """Scores of one sample masked by one chunk of activation channels.

    x1: [1, H, W, D]; acts_chunk: [K, S] token activations (CLS dropped) ->
    [K] target-class logits of x1 * minmax(upsample(A_c)).
    """
    cs = model.vit_cfg.image_size // model.vit_cfg.image_patch_size
    masks = _channel_masks_hwd(acts_chunk, cs, grid)
    logits, _ = model.apply(params, x1 * masks, deterministic=True)
    return logits


@partial(jax.jit, static_argnums=(0,))
def _ablation_chunk_jit(model, params, x1, acts1, channels):
    """Scores of one sample with one chunk of probe channels zeroed.

    acts1: [1, T, C] probe activations; channels: [K] channel indices.
    shift = -A * e_c zeroes channel c of the probe-layer LN output across
    the whole token stream (AblationLayerVit semantics) — expressible as a
    plain additive probe because the probe adds at exactly that activation.
    """
    k = channels.shape[0]
    onehot = jax.nn.one_hot(channels, acts1.shape[-1],
                            dtype=jnp.float32)                 # [K, C]
    shifts = -acts1 * onehot[:, None, :]                       # [K, T, C]
    xk = jnp.broadcast_to(x1, (k,) + x1.shape[1:])
    logits, _ = model.apply(params, xk, deterministic=True, probe_shift=shifts)
    return logits


def _forward_method_token_cam(model, params, x, logits, acts, class_idx,
                              method: str, score_batch: int,
                              eigen_smooth: bool, scorecam_chunk
                              ) -> jax.Array:
    """Shared scorecam/ablationcam scoring loop -> flat token CAM [B, S].

    Grid-rank agnostic: the 3D menu and the 2D tutorial workflow
    (vit_cam_2d) differ only in how a channel chunk is upsampled into an
    input mask, injected via ``scorecam_chunk(x1, acts_chunk) -> logits``
    (the ablation chunk is already shape-agnostic over the token stream).
    Callers reshape the result onto their own patch grid.
    """
    dim = model.vit_cfg.dim
    b = x.shape[0]
    # Pad the channel axis to whole chunks: one compiled shape per model.
    n_chunks = -(-dim // score_batch)
    pad = n_chunks * score_batch - dim
    cams = []
    for i in range(b):
        x1 = x[i:i + 1]
        cls = class_idx[i]
        scores = []
        if method == "scorecam":
            a_tok = acts[i, 1:, :].T                           # [C, S]
            a_tok = jnp.pad(a_tok, ((0, pad), (0, 0)))
            for c0 in range(0, dim + pad, score_batch):
                lg = scorecam_chunk(x1, a_tok[c0:c0 + score_batch])
                scores.append(lg[:, cls])
            w = jax.nn.softmax(jnp.concatenate(scores)[:dim])  # [C]
        else:                                                  # ablationcam
            acts1 = acts[i:i + 1]
            chan = jnp.pad(jnp.arange(dim), (0, pad))
            for c0 in range(0, dim + pad, score_batch):
                lg = _ablation_chunk_jit(model, params, x1, acts1,
                                         chan[c0:c0 + score_batch])
                scores.append(lg[:, cls])
            ablated = jnp.concatenate(scores)[:dim]
            base = logits[i, cls]
            # w_c = (score - ablated_score) / score, SIGNED (upstream
            # AblationCAM): with a negative target logit, a channel whose
            # removal lowers the score further is still important — dividing
            # by |score| would flip every weight's sign for such samples.
            safe = jnp.where(jnp.abs(base) > 1e-8, base,
                             jnp.where(base < 0, -1e-8, 1e-8))
            w = (base - ablated) / safe                        # [C]
        weighted = w[None, None, :] * acts[i:i + 1, 1:, :]     # [1, S, C]
        cams.append(_principal_projection(weighted)[0] if eigen_smooth
                    else jnp.sum(weighted[0], axis=1))
    return jnp.stack(cams)


def _forward_cam_raw(model, params, x, method: str, score_batch: int,
                     eigen_smooth: bool) -> Tuple[jax.Array, jax.Array]:
    grid = model.vit_cfg.image_size
    cs = grid // model.vit_cfg.image_patch_size
    b = x.shape[0]
    logits, acts = _probe_forward_jit(model, params, x)
    class_idx = jnp.argmax(logits, axis=1)
    cam = _forward_method_token_cam(
        model, params, x, logits, acts, class_idx, method, score_batch,
        eigen_smooth,
        lambda x1, a: _scorecam_chunk_jit(model, params, x1, a, grid))
    return token_grid_to_volume(cam.reshape(b, cs, cs, cs)), class_idx


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------

def compute_cam(model, variables: Dict, x, method: str = "gradcam",
                threshold: float = None, score_batch: int = 32,
                aug_smooth: bool = False, eigen_smooth: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
    """CAM for ``x`` ([B, H, W, D] or [H, W, D]) by any menu method.

    Returns ``(cam_3d, class_idx)`` with ``get_attention_map``'s squeeze
    behavior. ``score_batch`` bounds the per-forward channel count of the
    forward-only methods (the tutorial's ``cam.batch_size = 32``,
    gradcam_original.py:93-96); they run dim/score_batch forwards per sample.

    ``aug_smooth``/``eigen_smooth`` reproduce the tutorial's CLI flags
    (gradcam_original.py:25-27,96). aug_smooth averages the raw patch-grid
    CAM over test-time augmentations — the horizontal flip x intensity
    {0.9, 1.0, 1.1} menu of pytorch_grad_cam's forward_augmentation_
    smoothing, with the flipped CAMs flipped back before averaging — and
    runs the shared tail once on the average. Raw patch-grid CAMs are
    rendered in VOLUME axis order (token_grid_to_volume), so the flip-back
    axis is the same axis 2 the input was flipped on.
    eigen_smooth projects weighted activations onto their first principal
    component instead of channel-summing (see ``_token_cam``).
    """
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    if method == "gradcam-ref":
        if aug_smooth or eigen_smooth:
            raise ValueError("gradcam-ref reproduces the reference's own "
                             "pipeline, which has no smoothing flags")
        from neurovit_tpu.explainability.gradcam_vit3d import get_attention_map
        return get_attention_map(model, variables, x, threshold=threshold)
    params = variables["params"] if "params" in variables else variables
    if threshold is None:
        threshold = float(model.config["GRADCAM_THRESHOLD"])
    grid = model.vit_cfg.image_size
    x = jnp.asarray(x, jnp.float32)
    squeeze = False
    if x.ndim == 3:
        x, squeeze = x[None], True

    def raw_cam(xv):
        if method in GRAD_METHODS:
            return _grad_cam_raw_jit(model, params, xv, method, eigen_smooth)
        return _forward_cam_raw(model, params, xv, method, score_batch,
                                eigen_smooth)

    cam, class_idx = raw_cam(x)
    if aug_smooth:
        cams = [cam]
        for flip in (False, True):
            for scale in (0.9, 1.0, 1.1):
                if not flip and scale == 1.0:
                    continue            # identity: already computed
                xi = x * scale
                if flip:
                    xi = xi[:, :, ::-1, :]
                cam_i, _ = raw_cam(xi)
                cams.append(cam_i[:, :, ::-1, :] if flip else cam_i)
        cam = jnp.mean(jnp.stack(cams), axis=0)
    cam = np.asarray(finalize_cam(cam, grid, float(threshold)))
    if squeeze or cam.shape[0] == 1:
        cam = cam[0]
    return cam, np.asarray(class_idx)
