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


def test_smri_cam_driver(resnet_config, tmp_path):
    """sMRI structural CAM path (gradcam_sMRI.py analog): manifest
    Path_sMRI_brain reads, z-crop + global z-score, NIfTI + overlay out."""
    import pandas as pd

    from neurovit_tpu.data import nifti
    from neurovit_tpu.explainability import driver_smri

    rng = np.random.RandomState(0)
    rows = []
    for i in range(2):
        path = str(tmp_path / f"s{i}.nii")
        nifti.save(path, rng.randn(24, 30, 26).astype(np.float32))
        rows.append({"ID": i, "Subject": f"S{i:03d}", "Group": "CN",
                     "Sex": "F", "Age": 70, "Path_fMRI_brain": "",
                     "Path_sMRI_brain": path})
    csv = str(tmp_path / "manifest.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    config = dict(resnet_config, ADNI_CSV_PATH=csv,
                  GRADCAM_OUTPUT_DIR=str(tmp_path / "out"),
                  GRADCAM_SMRI_Z_CROP=(2, 24), GRADCAM_SMRI_SLICE_IDX=172)

    vol = driver_smri.load_smri(rows[0]["Path_sMRI_brain"], (2, 24))
    assert vol.shape == (24, 30, 22)                 # z-crop clamps
    assert abs(float(vol.mean())) < 1e-5 and abs(float(vol.std()) - 1) < 1e-4

    import os
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    pngs = driver_smri.create_smri_cam(model, variables, config)
    assert len(pngs) == 2 and all(os.path.exists(p) for p in pngs)
    heat = nifti.load(str(tmp_path / "out" / "structural" /
                          "gradcam_heatmapS000.nii"))
    assert tuple(heat.shape) == (24, 30, 22)


def test_vit_reshape_transform():
    """Token-stream -> CNN-layout helper (gradcam_sMRI.py:16-29): CLS
    dropped, grid folded, middle depth slice, channels first."""
    from neurovit_tpu.explainability.gradcam_vit3d import reshape_transform
    rng = np.random.RandomState(1)
    tokens = rng.randn(2, 1 + 4 * 3 * 5, 7).astype(np.float32)
    out = np.asarray(reshape_transform(tokens, 4, 3, 5))
    assert out.shape == (2, 7, 3, 5)
    expect = tokens[:, 1:].reshape(2, 4, 3, 5, 7)[:, 2].transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, expect, atol=1e-6)
