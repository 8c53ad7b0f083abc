"""Numerics parity of nn primitives against torch CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from neurovit_tpu import nn


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7, 32).astype(np.float32)
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)
    ours = nn.layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                         jnp.asarray(x))
    ln = torch.nn.LayerNorm(32)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
    theirs = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_linear_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(5, 16).astype(np.float32)
    w = rng.randn(16, 24).astype(np.float32)
    b = rng.randn(24).astype(np.float32)
    ours = nn.linear({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                     jnp.asarray(x))
    theirs = x @ w + b
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_gelu_exact_erf():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(nn.gelu(jnp.asarray(x)))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(6, 4).astype(np.float32)
    labels = rng.randint(0, 4, 6)
    ours = float(nn.softmax_cross_entropy(jnp.asarray(logits),
                                          jnp.asarray(labels)))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - theirs) < 1e-5


def test_linear_init_distribution():
    params = nn.linear_init(jax.random.key(0), 256, 128)
    bound = 1 / 16.0
    w = np.asarray(params["kernel"])
    assert w.shape == (256, 128)
    assert w.min() >= -bound and w.max() <= bound
    # roughly uniform: std of U(-b, b) is b/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.005


def test_dropout_scaling():
    x = jnp.ones((1000,))
    y = nn.dropout(jax.random.key(0), x, 0.5, deterministic=False)
    kept = np.asarray(y) > 0
    assert 0.4 < kept.mean() < 0.6
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
    y_det = nn.dropout(None, x, 0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_det), np.asarray(x))


def test_dropout_quantized_keep_is_unbiased():
    """uint8 masks quantize keep to q/256; the inverse scale must use the
    quantized keep so E[dropout(x)] == x (nn.py docstring)."""
    x = jnp.ones((200_000,))
    y = np.asarray(nn.dropout(jax.random.key(1), x, 0.1, deterministic=False))
    kept = y > 0
    q_keep = round(0.9 * 256) / 256              # 230/256 = 0.8984375
    assert abs(kept.mean() - q_keep) < 0.005     # quantized keep fraction
    np.testing.assert_allclose(y[kept], 1.0 / q_keep, rtol=1e-6)
    assert abs(y.mean() - 1.0) < 0.01            # unbiased overall


def test_dropout_tiny_rate_falls_back_to_exact_bernoulli():
    """rate < 1/512 would quantize to a no-op; the exact path must keep it a
    real (tiny) dropout with 1/keep scaling."""
    x = jnp.ones((300_000,))
    rate = 0.001
    y = np.asarray(nn.dropout(jax.random.key(2), x, rate, deterministic=False))
    dropped = (y == 0).mean()
    assert 0.0002 < dropped < 0.003              # not a no-op, near the rate
    np.testing.assert_allclose(y[y > 0], 1.0 / (1.0 - rate), rtol=1e-6)
