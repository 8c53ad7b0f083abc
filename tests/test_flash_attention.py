"""Pallas fused attention vs the XLA golden path (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu.ops.attention import _sdpa_xla
from neurovit_tpu.ops.flash_attention import flash_attention


def _qkv(b, h, n, d, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(b, h, n, d), jnp.float32) for _ in range(3)]


@pytest.mark.parametrize("n", [128, 140, 257])
def test_forward_matches_xla(n):
    q, k, v = _qkv(2, 2, n, 16)
    scale = 16 ** -0.5
    ours = flash_attention(q, k, v, scale=scale)
    golden = _sdpa_xla(q, k, v, scale=scale, dropout_rate=0.0,
                       dropout_rng=None, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden),
                               rtol=2e-4, atol=2e-4)


def test_backward_matches_xla():
    q, k, v = _qkv(1, 2, 140, 16, seed=1)
    scale = 16 ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_sdpa_xla(q, k, v, scale=scale, dropout_rate=0.0,
                                 dropout_rng=None, deterministic=True) ** 2)

    g_ours = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_gold = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_gold, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_dropout_statistics_and_determinism():
    q, k, v = _qkv(1, 1, 128, 16, seed=2)
    scale = 16 ** -0.5
    rng = jax.random.key(0)
    out1 = flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                           dropout_rng=rng)
    out2 = flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                           dropout_rng=rng)
    # Same rng -> identical mask -> identical output.
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    out3 = flash_attention(q, k, v, scale=scale, dropout_rate=0.5,
                           dropout_rng=jax.random.key(1))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # Dropout keeps the output in the right range (unbiased in expectation).
    base = flash_attention(q, k, v, scale=scale)
    ratio = np.abs(np.asarray(out1)).mean() / np.abs(np.asarray(base)).mean()
    assert 0.5 < ratio < 2.0


def test_dropout_backward_uses_same_mask():
    """grad through the dropped forward must be deterministic given the rng."""
    q, k, v = _qkv(1, 1, 128, 16, seed=3)
    rng = jax.random.key(7)

    def loss(q):
        return jnp.sum(flash_attention(q, k, v, scale=0.25, dropout_rate=0.3,
                                       dropout_rng=rng) ** 2)

    g1 = jax.grad(loss)(q)
    g2 = jax.grad(loss)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))


def test_small_head_dim_falls_back():
    """The temporal head's head_dim=1 regime must not hit the kernel."""
    q, k, v = _qkv(1, 2, 16, 1, seed=4)
    out = flash_attention(q, k, v, scale=1.0)
    golden = _sdpa_xla(q, k, v, scale=1.0, dropout_rate=0.0,
                       dropout_rng=None, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                               rtol=1e-4, atol=1e-4)
