"""Lane-padded token stream (pallas path) == unpadded XLA path."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.models import vit3d


def _cfg(impl):
    # 65 tokens (4^3 + CLS) -> pallas pads the stream to 128.
    return vit3d.ViTConfig(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=4, dim=64, depth=2, heads=4, dim_head=16, mlp_dim=128,
        channels=1, impl=impl, patch_embed="gather")


def test_padded_stream_matches_xla():
    params = vit3d.init(jax.random.key(0), _cfg("xla"))
    vol = jnp.asarray(np.random.RandomState(0).randn(2, 1, 20, 20, 20),
                      jnp.float32)
    # Request the probe explicitly (zeros shift): training-mode calls get
    # probe=None and the fused last block instead.
    shift = jnp.zeros((2, 65, 64), jnp.float32)
    logits_x, probe_x = vit3d.apply(params, vol, _cfg("xla"),
                                    probe_shift=shift)
    logits_p, probe_p = vit3d.apply(params, vol, _cfg("pallas"),
                                    probe_shift=shift)
    assert probe_p.shape == probe_x.shape == (2, 65, 64)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(probe_p), np.asarray(probe_x),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_padded_stream_gradients_match():
    params = vit3d.init(jax.random.key(1), _cfg("xla"))
    vol = jnp.asarray(np.random.RandomState(1).randn(1, 1, 20, 20, 20),
                      jnp.float32)

    def loss(params, impl):
        logits, _ = vit3d.apply(params, vol, _cfg(impl))
        return jnp.sum(logits ** 2)

    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_mean_pool_ignores_padding():
    cfg = vit3d.ViTConfig(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=4, dim=64, depth=1, heads=4, dim_head=16, mlp_dim=128,
        channels=1, impl="pallas", pool="mean", patch_embed="gather")
    params = vit3d.init(jax.random.key(0), cfg)
    vol = jnp.asarray(np.random.RandomState(2).randn(1, 1, 20, 20, 20),
                      jnp.float32)
    cfg_x = vit3d.ViTConfig(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=4, dim=64, depth=1, heads=4, dim_head=16, mlp_dim=128,
        channels=1, impl="xla", pool="mean", patch_embed="gather")
    logits_p, _ = vit3d.apply(params, vol, cfg)
    logits_x, _ = vit3d.apply(params, vol, cfg_x)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_x),
                               rtol=2e-3, atol=2e-3)
