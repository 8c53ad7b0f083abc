"""2D ViT CAM tutorial: the full pytorch_grad_cam ViT workflow, TPU-native.

The reference vendors the upstream pytorch_grad_cam tutorial
(``explainability/activation_map/gradcam_original.py``): load a 2D ViT
(DeiT-tiny), pick a CAM method from a menu, apply it to the last block's
first LayerNorm through a ``reshape_transform`` that folds the 197-token
stream back into the 14x14 patch grid, and write a jet overlay PNG
(gradcam_original.py:38-45,56-68,73,99). ``cam_methods`` already provides
the method *menu* natively for the 3D model; this module completes the
tutorial's own 2D workflow:

- a true 2D ViT built from the framework's 3D ViT with a degenerate frame
  axis (``frames=1, frame_patch_size=1`` — image 56, patch 4 gives the
  DeiT geometry's 14x14 token grid at CPU-friendly size),
- the CLI flag surface (``--method/--image-path/--aug_smooth/
  --eigen_smooth``, gradcam_original.py:21-30),
- ``show_cam_on_image``'s jet-overlay rendering
  (pytorch_grad_cam.utils.image, used at gradcam_original.py:99).

The tutorial downloads pretrained DeiT weights from torch.hub
(gradcam_original.py:70) — impossible offline, and DeiT's weights are not
this framework's to ship. Instead the demo trains the 2D ViT in-process on
a synthetic square-localization task (the 2D analog of the cube dataset,
``src/data/DatasetGradCAM.py:94-119``): each image carries one bright
square whose grid cell is the label, so a faithful CAM must light up the
square — the same self-verifying ground truth the reference uses to sanity
check Grad-CAM (README.md:116-122).
"""

from __future__ import annotations

import argparse
import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.explainability import cam_methods
from neurovit_tpu.explainability.gradcam_vit3d import probe_acts_grads
from neurovit_tpu.models import vit3d

# DeiT-tiny geometry (224/16 -> 14x14 tokens) scaled to CPU-demo size:
# 56/4 -> the same 14x14 grid, 197-token stream.
IMAGE_SIZE = 56
PATCH_SIZE = 4
SQUARE_SIZE = 14            # deliberately NOT a patch multiple (see dataset)
NUM_CLASSES = (IMAGE_SIZE // SQUARE_SIZE) ** 2


class ViT2D:
    """2D ViT as a single-frame 3D ViT; probe-compatible model object.

    Exposes the (``vit_cfg``, ``config``, ``apply``) surface that
    ``probe_acts_grads`` / ``cam_methods._token_cam`` consume, so every CAM
    method works on 2D images unchanged — the degenerate frame axis IS the
    tutorial's ``reshape_transform`` (gradcam_original.py:38-45): tokens
    fold to a (1, 14, 14) grid whose leading axis vanishes.
    """

    def __init__(self, num_classes: int = NUM_CLASSES, *,
                 image_size: int = IMAGE_SIZE, patch_size: int = PATCH_SIZE,
                 threshold: float = 50.0):
        # depth 2, not DeiT's 12: on this trivially separable task deeper
        # stacks concentrate class evidence in the CLS token and the probe
        # layer's spatial tokens stop localizing (measured: depth 4 -> 0/8
        # samples localize, depth 2 -> 6-8/8 across methods). The tutorial's
        # pretrained DeiT does not have this problem; the demo model must
        # stay shallow to be explainable.
        self.vit_cfg = vit3d.ViTConfig(
            image_size=image_size, image_patch_size=patch_size,
            frames=1, frame_patch_size=1, num_classes=num_classes,
            dim=64, depth=2, heads=4, dim_head=16, mlp_dim=128,
            channels=1, pool="cls", impl="xla")
        # The menu's default-threshold lookup (compute_cam reads
        # GRADCAM_THRESHOLD when none is passed).
        self.config = {"GRADCAM_THRESHOLD": threshold}

    def init(self, key: jax.Array) -> Dict:
        return {"params": vit3d.init(key, self.vit_cfg)}

    def apply(self, params: Dict, x: jax.Array, *, deterministic: bool = True,
              rng=None, probe_shift=None):
        """x: [B, H, W] grayscale image -> (logits, {"probe": act})."""
        volume = x[:, None, None, :, :]                 # [B, C=1, F=1, H, W]
        logits, probe = vit3d.apply(params, volume, self.vit_cfg,
                                    deterministic=deterministic, rng=rng,
                                    probe_shift=probe_shift)
        return logits, {"probe": probe}

    def __hash__(self):
        return hash(self.vit_cfg)

    def __eq__(self, other):
        return isinstance(other, ViT2D) and self.vit_cfg == other.vit_cfg


# --------------------------------------------------------------------------
# Synthetic 2D squares (DatasetGradCAM.py:94-119, one dimension down)
# --------------------------------------------------------------------------

def make_squares(key: jax.Array, n: int, *, image_size: int = IMAGE_SIZE,
                 square: int = SQUARE_SIZE, noise: float = 0.1
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """n images of background noise with one bright square per grid cell;
    label = linearized cell index (the cube dataset's scheme in 2D)."""
    cells = image_size // square
    k_noise, k_pos = jax.random.split(key)
    images = noise * jax.random.uniform(k_noise, (n, image_size, image_size))
    labels = jax.random.randint(k_pos, (n,), 0, cells * cells)
    ys, xs = labels // cells * square, labels % cells * square
    row = jnp.arange(image_size)
    mask = ((row[None, :, None] >= ys[:, None, None])
            & (row[None, :, None] < (ys + square)[:, None, None])
            & (row[None, None, :] >= xs[:, None, None])
            & (row[None, None, :] < (xs + square)[:, None, None]))
    images = jnp.where(mask, 1.0, images)
    return np.asarray(images, np.float32), np.asarray(labels, np.int64)


def train_demo_model(model: ViT2D, *, steps: int = 300, batch: int = 32,
                     seed: int = 0, verbose: bool = True) -> Dict:
    """Train the 2D ViT on the squares task (AdamW, the trainer's recipe at
    demo scale) until it can classify the square's cell — the stand-in for
    the tutorial's pretrained DeiT."""
    import optax

    key = jax.random.key(seed)
    k_init, k_data = jax.random.split(key)
    variables = model.init(k_init)
    images, labels = make_squares(k_data, 2048)
    tx = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits, _ = model.apply(p, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    params = variables["params"]
    rng = np.random.default_rng(seed)
    for i in range(steps):
        idx = rng.integers(0, len(images), batch)
        params, opt_state, loss, logits = step(
            params, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(labels[idx]))
        if verbose and (i + 1) % 100 == 0:
            acc = float((np.argmax(logits, 1) == labels[idx]).mean())
            print(f"step {i + 1}/{steps} | loss {float(loss):.4f} "
                  f"| batch acc {acc:.2f}")
    return {"params": params}


# --------------------------------------------------------------------------
# 2D CAM pipeline (the menu's math over a 2D patch grid)
# --------------------------------------------------------------------------

def finalize_cam_2d(cam: jax.Array, size: int, threshold: float) -> jax.Array:
    """2D CAM tail: ReLU -> per-sample min-max -> percentile threshold ->
    bilinear upsample to [B, size, size] (gradcam_vit3d.finalize_cam_nd,
    one dimension down; upstream scale_cam_image + the reference's
    threshold quirk)."""
    from neurovit_tpu.explainability.gradcam_vit3d import finalize_cam_nd
    return finalize_cam_nd(cam, (size, size), threshold, method="bilinear")


@partial(jax.jit, static_argnums=(0, 3, 4))
def _grad_cam_raw_2d(model, params, x, method: str, eigen_smooth: bool):
    cs = model.vit_cfg.image_size // model.vit_cfg.image_patch_size
    _, class_idx, acts, grads = probe_acts_grads(model, params, x)
    cam = cam_methods._token_cam(method, acts[:, 1:], grads[:, 1:],
                                 eigen_smooth)
    return cam.reshape(x.shape[0], cs, cs), class_idx


@partial(jax.jit, static_argnums=(0,))
def _scorecam_chunk_2d(model, params, x1, acts_chunk):
    """[K, S] activation channels -> [K, num_classes] logits of x1 masked by
    each channel's min-max-normalized bilinear upsample (ScoreCAM)."""
    k = acts_chunk.shape[0]
    size = model.vit_cfg.image_size
    cs = size // model.vit_cfg.image_patch_size
    masks = jax.image.resize(acts_chunk.reshape(k, cs, cs), (k, size, size),
                             method="bilinear")
    lo = masks.min(axis=(1, 2), keepdims=True)
    hi = masks.max(axis=(1, 2), keepdims=True)
    masks = (masks - lo) / (hi - lo + 1e-8)
    logits, _ = model.apply(params, x1 * masks)
    return logits


def _forward_cam_raw_2d(model, params, x, method: str, score_batch: int,
                        eigen_smooth: bool):
    """scorecam/ablationcam over the 2D grid: the per-sample scoring loop
    is cam_methods._forward_method_token_cam (shared with the 3D menu);
    only the channel-mask upsample is 2D-specific."""
    cs = model.vit_cfg.image_size // model.vit_cfg.image_patch_size
    b = x.shape[0]
    n_tokens = model.vit_cfg.num_patches + 1
    zeros = jnp.zeros((b, n_tokens, model.vit_cfg.dim), jnp.float32)
    logits, aux = model.apply(params, x, probe_shift=zeros)
    acts = aux["probe"].astype(jnp.float32)
    class_idx = jnp.argmax(logits, axis=1)
    cam = cam_methods._forward_method_token_cam(
        model, params, x, logits, acts, class_idx, method, score_batch,
        eigen_smooth,
        lambda x1, a: _scorecam_chunk_2d(model, params, x1, a))
    return cam.reshape(b, cs, cs), class_idx


def compute_cam_2d(model: ViT2D, variables: Dict, image,
                   method: str = "gradcam", threshold: float = None,
                   score_batch: int = 32, aug_smooth: bool = False,
                   eigen_smooth: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """CAM of a [H, W] or [B, H, W] image by any menu method; returns
    (cam [.., H, W] in [0, 1], class_idx). Flag semantics as the 3D menu
    (``cam_methods.compute_cam``); aug_smooth's horizontal flip is axis 2."""
    if method not in cam_methods.METHODS or method == "gradcam-ref":
        usable = tuple(m for m in cam_methods.METHODS if m != "gradcam-ref")
        raise ValueError(f"method must be one of {usable}, got {method!r}")
    params = variables["params"] if "params" in variables else variables
    if threshold is None:
        threshold = float(model.config["GRADCAM_THRESHOLD"])
    x = jnp.asarray(image, jnp.float32)
    squeeze = False
    if x.ndim == 2:
        x, squeeze = x[None], True

    def raw_cam(xv):
        if method in cam_methods.GRAD_METHODS:
            return _grad_cam_raw_2d(model, params, xv, method, eigen_smooth)
        return _forward_cam_raw_2d(model, params, xv, method, score_batch,
                                   eigen_smooth)

    cam, class_idx = raw_cam(x)
    if aug_smooth:
        cams = [cam]
        for flip in (False, True):
            for scale in (0.9, 1.0, 1.1):
                if not flip and scale == 1.0:
                    continue
                xi = x * scale
                if flip:
                    xi = xi[:, :, ::-1]
                cam_i, _ = raw_cam(xi)
                cams.append(cam_i[:, :, ::-1] if flip else cam_i)
        cam = jnp.mean(jnp.stack(cams), axis=0)
    cam = np.asarray(finalize_cam_2d(cam, model.vit_cfg.image_size,
                                     float(threshold)))
    if squeeze:
        cam = cam[0]
    return cam, np.asarray(class_idx)


def show_cam_on_image(rgb_img: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """Jet overlay, pytorch_grad_cam.utils.image.show_cam_on_image
    semantics: heatmap = jet(cam); out = (heatmap + img) / max -> uint8.
    rgb_img: [H, W, 3] float in [0, 1]; cam: [H, W] in [0, 1]."""
    from matplotlib import cm
    heatmap = np.asarray(cm.jet(np.clip(cam, 0.0, 1.0)))[..., :3]
    overlay = heatmap + np.asarray(rgb_img, np.float64)
    overlay = overlay / max(float(overlay.max()), 1e-8)
    return np.uint8(255 * overlay)


# --------------------------------------------------------------------------
# CLI (gradcam_original.py:21-35 flag surface)
# --------------------------------------------------------------------------

def _load_image(path: str, size: int) -> np.ndarray:
    """Image file -> [H, W] grayscale in [0, 1] (the model is single-channel;
    the tutorial's RGB normalization collapses to a grayscale z-score-free
    rescale here)."""
    import matplotlib.image as mpimg
    img = np.asarray(mpimg.imread(path), np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    if img.ndim == 3:
        img = img[..., :3].mean(axis=2)
    return np.asarray(jax.image.resize(jnp.asarray(img), (size, size),
                                       method="bilinear"))


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(
        description="CAM methods on a 2D ViT (the vendored pytorch_grad_cam "
                    "ViT tutorial, TPU-native and self-contained)")
    parser.add_argument("--image-path", type=str, default=None,
                        help="Input image; default: a synthetic square "
                             "sample the demo model was trained on")
    parser.add_argument("--method", type=str, default="gradcam",
                        choices=[m for m in cam_methods.METHODS
                                 if m != "gradcam-ref"])
    parser.add_argument("--aug_smooth", action="store_true",
                        help="Apply test time augmentation to smooth the CAM")
    parser.add_argument("--eigen_smooth", action="store_true",
                        help="Reduce noise by taking the first principle "
                             "componenet of cam_weights*activations")
    parser.add_argument("--steps", type=int, default=300,
                        help="demo-model training steps")
    parser.add_argument("--threshold", type=float, default=50.0,
                        help="percent of pixels kept by the CAM tail")
    parser.add_argument("--output-dir", type=str, default=".")
    args = parser.parse_args(argv)

    model = ViT2D(threshold=args.threshold)
    print(f"Training the demo 2D ViT ({args.steps} steps, "
          f"{NUM_CLASSES}-way square localization)...")
    variables = train_demo_model(model, steps=args.steps)

    if args.image_path is not None:
        image = _load_image(args.image_path, IMAGE_SIZE)
    else:
        image, label = make_squares(jax.random.key(123), 1)
        image, label = image[0], int(label[0])
        print(f"Synthetic sample: square at cell {label}")

    cam, class_idx = compute_cam_2d(
        model, variables, image, method=args.method,
        aug_smooth=args.aug_smooth, eigen_smooth=args.eigen_smooth)
    print(f"Predicted class: {int(class_idx[0])}")

    rgb = np.repeat(np.clip(image, 0.0, 1.0)[..., None], 3, axis=2)
    overlay = show_cam_on_image(rgb, cam)
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.method}_cam.png")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imsave(out_path, overlay)
    print(f"Saved {out_path}")
    return out_path


if __name__ == "__main__":
    main()
