"""ResNet CAMs, Integrated Gradients, kernel SHAP on tiny models."""

import jax
import numpy as np
import pytest

from neurovit_tpu.models import NeuroEncoder


@pytest.fixture
def resnet_config(tiny_config):
    return dict(tiny_config, MODEL_VOLUME_ENCODER="resnet",
                MODEL_RESNET_DEPTH=10, DATASET_NAME="adni")


def test_resnet_cam_methods(resnet_config):
    from neurovit_tpu.explainability.gradcam_resnet import resnet_cam
    model = NeuroEncoder(resnet_config)
    variables = model.init(jax.random.key(0))
    x = np.random.RandomState(0).randn(20, 20, 20).astype(np.float32)
    for method in ("gradcam", "gradcam_elementwise", "layercam"):
        cam, cls = resnet_cam(model, variables, x, method=method)
        assert cam.shape == (20, 20, 20)
        assert 0.0 <= cam.min() and cam.max() <= 1.0 + 1e-5
        assert int(cls[0]) in (0, 1)


def test_integrated_gradients_completeness(tiny_config):
    from neurovit_tpu.explainability.integrated_gradients import (
        completeness_gap, integrated_gradients)
    config = dict(tiny_config, DATASET_NAME="adni")
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    x = np.random.RandomState(1).randn(20, 20, 20).astype(np.float32)
    attr, cls = integrated_gradients(model, variables, x, steps=16)
    assert attr.shape == (20, 20, 20)
    # Completeness: sum(IG) ~= F_c(x) - F_c(b). NB: a zero baseline is
    # degenerate for this architecture (patch-LN scale invariance — see the
    # IG module docstring), so use a noise baseline.
    baseline = np.random.RandomState(2).randn(20, 20, 20).astype(np.float32)
    gap = completeness_gap(model, variables, x, steps=256, baseline=baseline)
    assert gap < 0.05, f"IG relative completeness gap too large: {gap}"


def test_kernel_shap_localizes_cube(tiny_config):
    """On the synthetic task, the region containing the cube should get the
    largest |SHAP| mass for the predicted class after the model sees it."""
    from neurovit_tpu.data.synthetic import GradCAMDataset
    from neurovit_tpu.explainability.shap_values import kernel_shap
    config = dict(tiny_config, GRADCAM_TRAIN_PATH=None, GRADCAM_VAL_PATH=None)
    ds = GradCAMDataset(config, "train")
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    s = ds.sample(0)
    attr, cls = kernel_shap(model, variables, s["volume"], nsamples=64,
                            region_size=10)
    assert attr.shape == (20, 20, 20)
    assert np.isfinite(attr).all()
