"""Kernel SHAP over cube superpixels for volume classifiers.

Replaces the reference's ``explainability/xAi_shap_Resnet3D/shapValues.py``
(shap.KernelExplainer over the *flattened* 90^3 volume with random-noise
background and nsamples=100 — "never managed to make it work",
``explainability/README.md:11``; 729k features from 100 samples cannot
identify anything). This implementation makes Kernel SHAP actually workable
on volumes by attributing over **cube superpixels** (the model's patch grid):

1. partition the volume into cube_size^3 regions (M = (grid/cube)^3 features),
2. sample coalitions z ~ Shapley kernel, masking disabled regions to the
   background value,
3. batch-evaluate the model over all coalition volumes on device,
4. solve the weighted least squares for per-region Shapley values.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _shapley_kernel_weights(m: int, sizes: np.ndarray) -> np.ndarray:
    """pi(z) = (M-1) / (C(M,|z|) |z| (M-|z|)); inf endpoints handled by
    large weights."""
    from math import comb
    w = np.empty(len(sizes))
    for i, s in enumerate(sizes):
        if s == 0 or s == m:
            w[i] = 1e6
        else:
            w[i] = (m - 1) / (comb(m, int(s)) * s * (m - s))
    return w


def kernel_shap(model, variables: Dict, x, *,
                region_size: Optional[int] = None,
                nsamples: int = 256,
                background: float = 0.0,
                batch_size: int = 32,
                seed: int = 0) -> Tuple[np.ndarray, int]:
    """x: [H,W,D] -> (shap_values [H,W,D] broadcast from regions, class_idx).

    Attributions explain the argmax-class logit relative to the background
    volume.
    """
    params = variables["params"] if "params" in variables else variables
    x = np.asarray(x, np.float32)
    grid = x.shape[0]
    region = region_size or model.config.get("GRADCAM_CUBE_SIZE", 8)
    region = min(region, grid)
    n_side = grid // region
    m = n_side ** 3

    @jax.jit
    def predict(batch):
        logits, _ = model.apply(params, batch, deterministic=True)
        return logits

    class_idx = int(np.argmax(np.asarray(predict(jnp.asarray(x[None])))[0]))

    rng = np.random.RandomState(seed)
    # Coalition matrix: always include the empty and full coalitions.
    z = rng.randint(0, 2, size=(nsamples, m)).astype(np.float32)
    z[0] = 0.0
    z[1] = 1.0

    # Region mask -> voxel mask by upsampling the n_side^3 grid.
    def to_voxel_mask(zrow):
        cube = zrow.reshape(n_side, n_side, n_side)
        return np.kron(cube, np.ones((region, region, region), np.float32))

    scores = np.empty(nsamples, np.float64)
    for start in range(0, nsamples, batch_size):
        rows = z[start:start + batch_size]
        vols = np.stack([
            np.where(to_voxel_mask(r)[:grid, :grid, :grid] > 0, x, background)
            for r in rows])
        logits = np.asarray(predict(jnp.asarray(vols)))
        scores[start:start + len(rows)] = logits[:, class_idx]

    weights = _shapley_kernel_weights(m, z.sum(axis=1))
    # Weighted least squares with intercept: scores ~ b0 + z @ phi.
    A = np.concatenate([np.ones((nsamples, 1)), z], axis=1)
    W = np.diag(weights)
    coef, *_ = np.linalg.lstsq(W @ A, W @ scores, rcond=None)
    phi = coef[1:]

    voxel_attr = np.kron(phi.reshape(n_side, n_side, n_side),
                         np.ones((region, region, region)))[:grid, :grid, :grid]
    return voxel_attr.astype(np.float32), class_idx
