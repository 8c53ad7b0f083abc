"""CAM method menu (cam_methods.py): the tutorial's method set, native 3D.

Covers the framework equivalent of the reference's vendored
pytorch_grad_cam ViT tutorial (explainability/activation_map/
gradcam_original.py): every menu method must produce a valid normalized
CAM, batched calls must match per-sample calls, the ablation probe must
actually zero probe channels, and (slow tier) the gradient methods must
localize the synthetic cube after training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu.data.synthetic import GradCAMDataset
from neurovit_tpu.explainability import cam_methods
from neurovit_tpu.models import NeuroEncoder


@pytest.fixture(scope="module")
def setup(tiny_config_module):
    config = dict(tiny_config_module, GRADCAM_TRAIN_PATH=None,
                  GRADCAM_VAL_PATH=None)
    ds = GradCAMDataset(config, "val")
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    return config, ds, model, variables


@pytest.mark.parametrize("method", cam_methods.METHODS)
def test_every_method_shape_and_range(setup, method):
    config, ds, model, variables = setup
    grid = config["TRAINING_VIT_INPUT_SIZE"]
    cam, class_idx = cam_methods.compute_cam(
        model, variables, ds.sample(0)["volume"], method=method)
    assert cam.shape == (grid, grid, grid)
    assert np.isfinite(cam).all()
    assert 0.0 <= cam.min() and cam.max() <= 1.0 + 1e-6
    assert int(np.asarray(class_idx).ravel()[0]) in range(model.num_classes)
    # The percentile threshold keeps the map sparse (same tail as the
    # reference pipeline).
    assert (cam > 0).mean() < 0.5


def test_unknown_method_raises(setup):
    _, ds, model, variables = setup
    with pytest.raises(ValueError, match="method must be one of"):
        cam_methods.compute_cam(model, variables, ds.sample(0)["volume"],
                                method="fullgrad")


def test_gradcam_ref_matches_get_attention_map(setup):
    _, ds, model, variables = setup
    v = ds.sample(0)["volume"]
    cam_menu, idx_menu = cam_methods.compute_cam(model, variables, v,
                                                 method="gradcam-ref")
    cam_ref, idx_ref = model.get_attention_map(variables, v)
    np.testing.assert_allclose(cam_menu, cam_ref, rtol=1e-6, atol=1e-7)
    assert int(idx_menu[0]) == int(idx_ref[0])


@pytest.mark.parametrize("method", ["gradcam", "gradcam++", "eigencam"])
def test_batched_matches_per_sample(setup, method):
    _, ds, model, variables = setup
    v0, v1 = ds.sample(0)["volume"], ds.sample(1)["volume"]
    cam_b, idx_b = cam_methods.compute_cam(model, variables,
                                           np.stack([v0, v1]), method=method)
    assert cam_b.shape == (2,) + v0.shape
    for i, v in enumerate((v0, v1)):
        cam_1, idx_1 = cam_methods.compute_cam(model, variables, v,
                                               method=method)
        assert int(idx_b[i]) == int(idx_1[0])
        np.testing.assert_allclose(cam_b[i], cam_1, rtol=1e-4, atol=1e-5)


def test_ablation_probe_zeroes_channel(setup):
    """shift = -A * e_c through the additive probe must zero exactly that
    channel of the probe activation (the AblationLayerVit contract)."""
    _, ds, model, variables = setup
    params = variables["params"]
    x = jnp.asarray(ds.sample(0)["volume"], jnp.float32)[None]
    _, acts = cam_methods._probe_forward_jit(model, params, x)
    chan = jnp.asarray([3])
    onehot = jax.nn.one_hot(chan, acts.shape[-1], dtype=jnp.float32)
    shift = -acts * onehot[:, None, :]
    _, aux = model.apply(params, x, deterministic=True, probe_shift=shift)
    ablated = np.asarray(aux["probe"], np.float32)
    np.testing.assert_allclose(ablated[..., 3], 0.0, atol=1e-5)
    np.testing.assert_allclose(ablated[..., 4], np.asarray(acts)[..., 4],
                               rtol=1e-4, atol=1e-5)


def test_gradcam_pp_formula_matches_upstream(setup):
    """Pin the gradcam++ alphas to the upstream pytorch_grad_cam formula:
    alpha = g^2 / (2 g^2 + (sum_s A) * g^3)."""
    rng = np.random.RandomState(0)
    a = rng.randn(2, 27, 16).astype(np.float32)
    g = rng.randn(2, 27, 16).astype(np.float32)
    got = np.asarray(cam_methods._token_cam(
        "gradcam++", jnp.asarray(a), jnp.asarray(g)))
    denom = 2.0 * g**2 + a.sum(axis=1, keepdims=True) * g**3
    alpha = np.where(np.abs(denom) > 1e-12, g**2 / denom, 0.0)
    w = (alpha * np.maximum(g, 0)).sum(axis=1, keepdims=True)
    want = (w * a).sum(axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_xgradcam_formula(setup):
    rng = np.random.RandomState(1)
    a = rng.rand(1, 27, 16).astype(np.float32)
    g = rng.randn(1, 27, 16).astype(np.float32)
    got = np.asarray(cam_methods._token_cam(
        "xgradcam", jnp.asarray(a), jnp.asarray(g)))
    w = (g * a).sum(axis=1, keepdims=True) / (a.sum(axis=1, keepdims=True)
                                              + 1e-8)
    np.testing.assert_allclose(got, (w * a).sum(axis=2), rtol=1e-4,
                               atol=1e-5)


def test_threshold_kwarg_controls_sparsity(setup):
    """Explicit threshold overrides GRADCAM_THRESHOLD for every method,
    including the gradcam-ref delegation."""
    _, ds, model, variables = setup
    v = ds.sample(0)["volume"]
    for method in ("gradcam", "gradcam-ref"):
        tight, _ = cam_methods.compute_cam(model, variables, v,
                                           method=method, threshold=2.0)
        loose, _ = cam_methods.compute_cam(model, variables, v,
                                           method=method, threshold=50.0)
        assert (tight > 0).mean() < (loose > 0).mean()


def test_eigencam_sign_is_positive_mass(setup):
    """The principal projection's sign is normalized so the ReLU tail keeps
    the dominant component (a flipped sign would zero the whole map)."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 27, 16), jnp.float32)
    proj = np.asarray(cam_methods._principal_projection(a))
    for b in range(2):
        pos = np.maximum(proj[b], 0).sum()
        neg = np.maximum(-proj[b], 0).sum()
        assert pos >= neg


@pytest.mark.slow
def test_methods_localize_cube_after_training(tiny_config):
    """Gradient and ablation methods must concentrate attention on the cube
    once the classifier has learned it (the tutorial's visual QA, automated
    — same protocol as test_gradcam_localization)."""
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_EPOCHS": 4, "TRAINING_LEARNING_RATE": 1e-3,
                   "GRADCAM_NUM_SAMPLES": 160, "DATASET_GENERATE": True,
                   "GRADCAM_THRESHOLD": 20})
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    trainer.run()
    acc = trainer.evaluate_samples()
    assert acc > 0.8, f"model did not learn ({acc}); CAM check meaningless"
    variables = {"params": trainer.train_state["params"]}

    # Only the methods that are robust on SIGNED LayerNorm activations are
    # strictly asserted. Measured on this trained 2-block model with the
    # volume-order CAM rendering (token_grid_to_volume; hits over val
    # samples): gradcam-ref 16/16 (pinned by test_gradcam_localization),
    # layercam 16/16, scorecam 8/8, gradcam 8/16, xgradcam 4/8,
    # eigen/ablation variants weaker. The weak ones reproduce the upstream
    # formulas faithfully (pinned numerically above) but those formulas
    # assume non-negative CNN feature maps — on a zero-centered ViT norm
    # layer their channel weights are unreliable, which is a property of
    # the methods, not the port (see cam_methods module docstring). The
    # rendering permutation itself is pinned by the same protocol: under
    # the reference's token-order rendering these scores drop to ~chance
    # (gradcam-ref 7/16), see token_grid_to_volume.
    for method in ("layercam", "scorecam"):
        hits, total = 0, 0
        for idx in range(4):
            sample = ds_val.sample(idx)
            cam, _ = cam_methods.compute_cam(model, variables,
                                             sample["volume"], method=method)
            cube = sample["volume"] == 1.0
            total += 1
            if cam[cube].mean() > cam[~cube].mean():
                hits += 1
        assert hits >= total // 2 + 1, \
            f"{method} localization weak: {hits}/{total}"


def test_eigen_smooth_valid_and_differs(setup):
    """--eigen_smooth (gradcam_original.py:26-27,96): principal-component
    reduction of the weighted activations, for gradient and forward
    methods; eigen methods are already projections and are unchanged."""
    _, ds, model, variables = setup
    v = ds.sample(0)["volume"]
    for method in ("gradcam", "ablationcam"):
        plain, idx_p = cam_methods.compute_cam(model, variables, v,
                                               method=method)
        smooth, idx_s = cam_methods.compute_cam(model, variables, v,
                                                method=method,
                                                eigen_smooth=True)
        assert smooth.shape == plain.shape
        assert np.isfinite(smooth).all()
        assert 0.0 <= smooth.min() and smooth.max() <= 1.0 + 1e-6
        assert int(idx_s[0]) == int(idx_p[0])
        assert not np.allclose(smooth, plain)
    same, _ = cam_methods.compute_cam(model, variables, v, method="eigencam",
                                      eigen_smooth=True)
    base, _ = cam_methods.compute_cam(model, variables, v, method="eigencam")
    np.testing.assert_allclose(same, base, rtol=1e-5, atol=1e-6)


def test_aug_smooth_valid_map(setup):
    """--aug_smooth (gradcam_original.py:25,96): flip x intensity test-time
    augmentation averaging in raw-CAM space."""
    _, ds, model, variables = setup
    v = ds.sample(0)["volume"]
    plain, idx_p = cam_methods.compute_cam(model, variables, v,
                                           method="gradcam")
    smooth, idx_s = cam_methods.compute_cam(model, variables, v,
                                            method="gradcam", aug_smooth=True)
    assert smooth.shape == plain.shape
    assert np.isfinite(smooth).all()
    assert 0.0 <= smooth.min() and smooth.max() <= 1.0 + 1e-6
    # class_idx comes from the unaugmented forward
    assert int(idx_s[0]) == int(idx_p[0])
    assert not np.allclose(smooth, plain)


def test_smoothing_flags_rejected_for_ref_variant(setup):
    _, ds, model, variables = setup
    v = ds.sample(0)["volume"]
    for kwargs in ({"aug_smooth": True}, {"eigen_smooth": True}):
        with pytest.raises(ValueError, match="no smoothing flags"):
            cam_methods.compute_cam(model, variables, v,
                                    method="gradcam-ref", **kwargs)


def test_scorecam_masks_are_input_oriented():
    """The ScoreCAM channel masks must be (h, w, d)-oriented like the model
    INPUT, not (d, h, w)-oriented like the token stream: a channel whose
    activation is one-hot at token grid position (d0, h0, w0) must mask the
    input around voxel (h0, w0, d0). Regression for the silent transpose
    (token order comes from the encoder's [B,H,W,D] -> [B,1,D,H,W] permute,
    neuro_encoder.py:123)."""
    cs, patch = 4, 5
    grid = cs * patch
    d0, h0, w0 = 1, 3, 0                              # deliberately distinct
    acts = np.zeros((1, cs ** 3), np.float32)
    acts[0, (d0 * cs + h0) * cs + w0] = 1.0           # (d, h, w) token order
    mask = np.asarray(cam_methods._channel_masks_hwd(
        jnp.asarray(acts), cs, grid))[0]              # [H, W, D]
    hot = np.unravel_index(np.argmax(mask), mask.shape)
    want = (h0 * patch + patch // 2, w0 * patch + patch // 2,
            d0 * patch + patch // 2)
    assert all(abs(a - b) <= patch // 2 for a, b in zip(hot, want)), \
        f"mask peak {hot} not at input voxel {want}"
    assert mask.min() >= 0.0 and mask.max() <= 1.0


def test_token_grid_order_is_zxy():
    """Pins the convention the CAM rendering depends on: the encoder maps
    volume cell (x, y, z) to token grid position (f, h, w) = (z, x, y)
    (neuro_encoder.py:123 permute + vit3d.patchify). If this ever changes,
    token_grid_to_volume must change with it."""
    from neurovit_tpu.models import vit3d
    cs, patch = 4, 5
    grid = cs * patch
    cfg = vit3d.ViTConfig(image_size=grid, image_patch_size=patch,
                          frames=grid, frame_patch_size=patch,
                          num_classes=2, dim=16, depth=1, heads=2,
                          dim_head=8, mlp_dim=32)
    cx, cy, cz = 3, 0, 1
    vol = np.zeros((1, grid, grid, grid), np.float32)
    vol[0, cx * patch:(cx + 1) * patch, cy * patch:(cy + 1) * patch,
        cz * patch:(cz + 1) * patch] = 1.0
    x = jnp.asarray(vol).transpose(0, 3, 1, 2)[:, None]   # encoder permute
    tokens = vit3d.patchify(x, cfg)
    t = int(jnp.argmax(jnp.abs(tokens[0]).sum(-1)))
    f0, rem = divmod(t, cs * cs)
    h0, w0 = divmod(rem, cs)
    assert (f0, h0, w0) == (cz, cx, cy)
