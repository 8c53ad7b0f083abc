"""Conv-lowered patch embedding == reference gather lowering (golden)."""

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.models import vit3d
from neurovit_tpu.models.vit3d import (_patch_embed_conv,
                                       _patch_embed_gather)


def _cfg(**kw):
    return vit3d.ViTConfig(
        image_size=18, image_patch_size=3, frames=18, frame_patch_size=3,
        num_classes=4, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        channels=1, **kw)


def test_conv_matches_gather():
    cfg = _cfg()
    params = vit3d.init(jax.random.key(0), cfg)
    pe = params["patch_embed"]
    vol = jnp.asarray(np.random.RandomState(0).randn(2, 1, 18, 18, 18),
                      jnp.float32)
    gather = _patch_embed_gather(pe, vol, cfg)
    conv = _patch_embed_conv(pe, vol, cfg)
    np.testing.assert_allclose(np.asarray(conv), np.asarray(gather),
                               rtol=3e-4, atol=3e-4)


def test_conv_matches_gather_nontrivial_affine():
    """Exercise the gamma/beta algebra with non-default LN params."""
    cfg = _cfg()
    params = vit3d.init(jax.random.key(1), cfg)
    rng = np.random.RandomState(2)
    pe = params["patch_embed"]
    pe = dict(pe)
    pe["norm_pre"] = {
        "scale": jnp.asarray(rng.rand(cfg.patch_dim).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(cfg.patch_dim).astype(np.float32)),
    }
    vol = jnp.asarray(rng.randn(1, 1, 18, 18, 18), jnp.float32)
    gather = _patch_embed_gather(pe, vol, cfg)
    conv = _patch_embed_conv(pe, vol, cfg)
    np.testing.assert_allclose(np.asarray(conv), np.asarray(gather),
                               rtol=3e-4, atol=3e-4)


def test_conv_gradients_match_gather():
    cfg = _cfg()
    params = vit3d.init(jax.random.key(0), cfg)
    vol = jnp.asarray(np.random.RandomState(3).randn(1, 1, 18, 18, 18),
                      jnp.float32)

    def loss(pe, fn):
        return jnp.sum(fn(pe, vol, cfg) ** 2)

    g_gather = jax.grad(lambda pe: loss(pe, _patch_embed_gather))(
        params["patch_embed"])
    g_conv = jax.grad(lambda pe: loss(pe, _patch_embed_conv))(
        params["patch_embed"])
    for a, b in zip(jax.tree.leaves(g_gather), jax.tree.leaves(g_conv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_full_vit_same_logits_both_lowerings():
    params = vit3d.init(jax.random.key(0), _cfg())
    vol = jnp.asarray(np.random.RandomState(4).randn(2, 1, 18, 18, 18),
                      jnp.float32)
    logits_g, _ = vit3d.apply(params, vol, _cfg(patch_embed="gather"))
    logits_c, _ = vit3d.apply(params, vol, _cfg(patch_embed="conv"))
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_g),
                               rtol=2e-3, atol=2e-3)
