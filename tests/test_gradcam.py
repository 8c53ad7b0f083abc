"""Grad-CAM pipeline: probe gradients, CAM shape/range, threshold."""

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.data.synthetic import GradCAMDataset
from neurovit_tpu.explainability.gradcam_vit3d import (get_attention_map,
                                                       visualize_slice)
from neurovit_tpu.models import NeuroEncoder


def test_attention_map_shape_and_range(tiny_config):
    config = dict(tiny_config, GRADCAM_TRAIN_PATH=None, GRADCAM_VAL_PATH=None)
    ds = GradCAMDataset(config, "val")
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    sample = ds.sample(0)

    cam, class_idx = get_attention_map(model, variables, sample["volume"])
    grid = config["TRAINING_VIT_INPUT_SIZE"]
    assert cam.shape == (grid, grid, grid)
    assert 0.0 <= cam.min() and cam.max() <= 1.0 + 1e-6
    assert int(class_idx[0]) in range(model.num_classes)
    # Percentile threshold keeps ~GRADCAM_THRESHOLD% of the *patch grid*
    # active before upsampling -> the upsampled CAM is mostly zero.
    assert (cam > 0).mean() < 0.5


def test_probe_gradient_nonzero(tiny_config):
    """The vjp through the probe must produce real gradients (the hook
    replacement actually differentiates through the last block)."""
    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 20, 20, 20), jnp.float32)
    n_tokens = model.vit_cfg.num_patches + 1
    zeros = jnp.zeros((1, n_tokens, model.vit_cfg.dim))

    def fwd(shift):
        logits, aux = model.apply(variables["params"], x, probe_shift=shift)
        return logits

    logits, vjp_fn = jax.vjp(fwd, zeros)
    (g,) = vjp_fn(jnp.ones_like(logits))
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_batched_cam_matches_per_sample(tiny_config):
    """Batched CAM must normalize per sample: each map in a B=2 call equals
    the same sample's B=1 map (the reference is B=1-only, so its global
    min/max/percentile are per-sample by construction)."""
    config = dict(tiny_config, GRADCAM_TRAIN_PATH=None, GRADCAM_VAL_PATH=None)
    ds = GradCAMDataset(config, "val")
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    v0, v1 = ds.sample(0)["volume"], ds.sample(1)["volume"]

    batch = np.stack([v0, v1])
    cam_b, idx_b = get_attention_map(model, variables, batch)
    assert cam_b.shape == (2,) + v0.shape
    for i, v in enumerate((v0, v1)):
        cam_1, idx_1 = get_attention_map(model, variables, v)
        assert int(idx_b[i]) == int(idx_1[0])
        np.testing.assert_allclose(cam_b[i], cam_1, rtol=1e-4, atol=1e-5)


def test_val_label_coverage_ceiling_flagship():
    """The flagship showcase's val-accuracy plateau is a dataset property,
    not a model defect: cube positions are sampled uniformly over
    (90//8)^3 = 1331 classes (reference DatasetGradCAM.py:100-119), so with
    3200 train draws ~e^-2.4 = 9% of classes never occur in training, and a
    1331-way softmax classifier cannot emit a label it never saw. For the
    showcase seed (42) the ceiling is exactly 721/800 = 0.90125 — the
    on-chip run plateaus at exactly this value with train accuracy 1.0
    (BENCH.md "End-to-end convergence showcase"; `scripts/eval_showcase.py`
    verifies the trained model's errors are exactly the unseen-label
    samples). The reference generator shares the ceiling; its config
    comment's "100%" is the 2-class ADNI age task
    (reference configs/config.yaml:23 "classification 2"), not this task.
    """
    config = {
        "TRAINING_VIT_INPUT_SIZE": 90, "GRADCAM_CUBE_SIZE": 8,
        "GRADCAM_BACKGROUND_NOISE": 0, "GRADCAM_NUM_SAMPLES": 4000,
        "TRAINING_SEED": 42, "GRADCAM_TRAIN_PATH": None,
        "GRADCAM_VAL_PATH": None,
    }
    train = GradCAMDataset(config, "train")
    val = GradCAMDataset(config, "val")
    assert len(train) == 3200 and len(val) == 800
    achievable = np.isin(val.labels, np.unique(train.labels))
    assert int(achievable.sum()) == 721  # ceiling = 721/800 = 0.90125


def test_visualize_slice_dims(tiny_config):
    cam = np.random.RandomState(0).rand(20, 20, 20)
    vol = np.random.RandomState(1).rand(20, 20, 20)
    for dim in (0, 1, 2):
        config = dict(tiny_config, GRADCAM_SLICE_DIM=dim, GRADCAM_SLICE_IDX=5)
        img, attn = visualize_slice(config, cam, vol)
        assert img.shape == (20, 20) and attn.shape == (20, 20)
    config = dict(tiny_config, GRADCAM_SLICE_DIM=7)
    assert visualize_slice(config, cam, vol) is None
