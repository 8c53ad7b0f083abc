"""3D ResNet: primitive parity vs torch + architecture shape checks."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from neurovit_tpu.models import resnet3d


def test_conv3d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 9, 10).astype(np.float32)
    w = rng.randn(5, 3, 3, 3, 3).astype(np.float32)
    # Internal compute layout is channels-last (NDHWC); params stay OIDHW.
    x_cl = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    ours = resnet3d.conv3d({"kernel": jnp.asarray(w)}, x_cl,
                           stride=(2, 2, 2), padding=(1, 1, 1))
    theirs = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1).numpy()
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 4, 1, 2, 3),
                               theirs, rtol=1e-4, atol=1e-4)


def test_batch_norm_train_and_eval_match_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 6, 5, 5, 5).astype(np.float32)
    params = {"scale": jnp.asarray(rng.rand(6).astype(np.float32)),
              "bias": jnp.asarray(rng.randn(6).astype(np.float32))}
    state = {"mean": jnp.zeros(6), "var": jnp.ones(6)}

    tbn = torch.nn.BatchNorm3d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))

    # Train mode: normalized by batch stats; running stats updated.
    x_cl = jnp.asarray(x.transpose(0, 2, 3, 4, 1))   # channels-last compute
    ours, new_state = resnet3d.batch_norm(params, state, x_cl, train=True)
    tbn.train()
    theirs = tbn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 4, 1, 2, 3),
                               theirs, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # Eval mode: normalized by running stats.
    ours_eval, _ = resnet3d.batch_norm(params, new_state, x_cl, train=False)
    tbn.eval()
    theirs_eval = tbn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours_eval).transpose(0, 4, 1, 2, 3),
                               theirs_eval, rtol=1e-3, atol=1e-4)


def test_max_pool3d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 9, 9, 9).astype(np.float32)
    ours = resnet3d.max_pool3d(jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    theirs = torch.nn.functional.max_pool3d(
        torch.from_numpy(x), kernel_size=3, stride=2, padding=1).numpy()
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 4, 1, 2, 3),
                               theirs, atol=1e-6)


def test_max_pool3d_taps_grad_matches_autodiff():
    """The scatter-free backward equals reduce_window's autodiff gradient.

    Random continuous inputs are tie-free, so the equal-split tie
    convention never fires and the two must agree to float rounding.
    Covers the stem config plus stride-1 / even-kernel / odd-dim shapes
    (parity slices of unequal natural length exercise the high-padding).
    """
    rng = np.random.RandomState(3)
    for shape, cfg in [((2, 10, 9, 7, 4), dict(ksize=3, stride=2, padding=1)),
                       ((1, 8, 8, 8, 2), dict(ksize=2, stride=2, padding=0)),
                       ((2, 7, 5, 6, 3), dict(ksize=3, stride=1, padding=1)),
                       # B=12 with the default chunk 8: exercises the
                       # largest-divisor chunk fallback (6) in the backward.
                       ((12, 6, 5, 4, 2), dict(ksize=3, stride=2, padding=1))]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        g = jnp.asarray(rng.randn(
            *resnet3d.max_pool3d(x, **cfg).shape).astype(np.float32))
        d_ref = jax.grad(
            lambda v: jnp.vdot(resnet3d.max_pool3d(v, **cfg), g))(x)
        d_new = jax.grad(
            lambda v: jnp.vdot(resnet3d.max_pool3d_taps(v, **cfg), g))(x)
        fwd_ref = resnet3d.max_pool3d(x, **cfg)
        fwd_new = resnet3d.max_pool3d_taps(x, **cfg)
        assert bool(jnp.all(fwd_ref == fwd_new))
        np.testing.assert_allclose(np.asarray(d_new), np.asarray(d_ref),
                                   rtol=1e-6, atol=1e-6)


def test_resnet18_forward_shapes():
    cfg = resnet3d.ResNetConfig(depth=18, n_input_channels=1, n_classes=2)
    variables = resnet3d.init(jax.random.key(0), cfg)
    x = jnp.zeros((2, 1, 32, 32, 32))
    logits, new_state = resnet3d.apply(variables["params"],
                                       variables["state"], x, cfg)
    assert logits.shape == (2, 2)
    logits, _, feats = resnet3d.apply(variables["params"], variables["state"],
                                      x, cfg, capture_features=True)
    assert feats.shape[1] == 512      # layer4 channels, expansion 1


@pytest.mark.slow
def test_resnet50_bottleneck_and_shortcut_a():
    cfg = resnet3d.ResNetConfig(depth=50, n_input_channels=1, n_classes=4,
                                shortcut_type="A")
    variables = resnet3d.init(jax.random.key(0), cfg)
    x = jnp.zeros((1, 1, 32, 32, 32))
    logits, _ = resnet3d.apply(variables["params"], variables["state"], x, cfg)
    assert logits.shape == (1, 4)
    # Shortcut 'A' has no downsample parameters anywhere.
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    assert not any("ds_conv" in str(path) for path, _ in flat)


def test_generate_model_depths():
    for depth in (10, 18, 34, 50):
        cfg = resnet3d.ResNetConfig(depth=depth)
        kind, blocks = resnet3d.BLOCK_LAYOUTS[depth]
        assert cfg.block_kind == kind and tuple(cfg.stage_blocks) == blocks
