"""Fused attention path (LN+QKV kernel -> bnhd flash -> outproj kernel):
numerics vs the XLA composition, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu.models import vit3d
from neurovit_tpu.ops import fused_outproj, fused_qkv
from neurovit_tpu.ops.flash_attention import flash_attention


def _cfg(impl, dropout=0.0):
    return vit3d.ViTConfig(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=3, dim=64, depth=2, heads=4, dim_head=16, mlp_dim=96,
        dropout=dropout, emb_dropout=dropout, impl=impl)


def test_fused_ln_qkv_matches_xla():
    cfg = _cfg("pallas")
    key = jax.random.key(0)
    params = vit3d.init(key, cfg)
    block = jax.tree.map(lambda p: p[0], params["blocks"])
    x = jax.random.normal(jax.random.key(1), (2, 17, cfg.dim), jnp.float32)

    def fused(x, block):
        q, k, v = fused_qkv.fused_ln_qkv(block, x, cfg.heads, cfg.dim_head)
        return q, k, v

    def ref(x, block):
        from neurovit_tpu import nn
        normed = nn.layer_norm(block["attn_norm"], x)
        w = block["qkv"]["kernel"].reshape(cfg.dim, 3, cfg.heads,
                                           cfg.dim_head)
        # bnhd layout to match the fused kernel's outputs.
        return tuple(jnp.einsum("bnd,dhe->bnhe", normed, w[:, i])
                     for i in range(3))

    out_f = fused(x, block)
    out_r = ref(x, block)
    for a, b in zip(out_f, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # Gradients (params + input) through both paths.
    def loss_f(x, block):
        q, k, v = fused(x, block)
        return jnp.sum(q * 1.3 + k * 0.7 - v * 0.1)

    def loss_r(x, block):
        q, k, v = ref(x, block)
        return jnp.sum(q * 1.3 + k * 0.7 - v * 0.1)

    gf = jax.grad(loss_f, argnums=(0, 1))(x, block)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, block)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-4, atol=2e-5)
    for path in (("attn_norm", "scale"), ("attn_norm", "bias"),
                 ("qkv", "kernel")):
        a, b = gf[1], gr[1]
        for k_ in path:
            a, b = a[k_], b[k_]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


def test_fused_outproj_matches_xla():
    key = jax.random.key(2)
    from neurovit_tpu import nn
    params = nn.linear_init(key, 64, 96)
    x = jax.random.normal(jax.random.key(3), (2, 9, 96), jnp.float32)
    attn = jax.random.normal(jax.random.key(4), (2, 9, 64), jnp.float32)

    def fused(attn, x, params):
        return fused_outproj.fused_outproj_residual(
            params, x, attn, deterministic=True)

    def ref(attn, x, params):
        return x + nn.linear(params, attn)

    np.testing.assert_allclose(np.asarray(fused(attn, x, params)),
                               np.asarray(ref(attn, x, params)),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a))), argnums=(0, 1, 2))(
        attn, x, params)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=(0, 1, 2))(
        attn, x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_flash_bnhd_matches_bhnd():
    rng = np.random.RandomState(0)
    b, h, n, d = 2, 4, 128, 16
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    scale = d ** -0.5

    o_bhnd = flash_attention(q, k, v, scale=scale)
    o_bnhd = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3), scale=scale,
                             layout="bnhd")
    np.testing.assert_allclose(np.asarray(o_bnhd.transpose(0, 2, 1, 3)),
                               np.asarray(o_bhnd), rtol=2e-5, atol=2e-5)

    # Gradients agree across layouts too.
    def loss(fn, *args):
        return jnp.sum(jnp.cos(fn(*args)))

    g1 = jax.grad(lambda q, k, v: loss(
        lambda *a: flash_attention(*a, scale=scale), q, k, v),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: loss(
        lambda *a: flash_attention(*a, scale=scale, layout="bnhd"),
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_vit_forward_pallas_fused_matches_xla():
    """Whole-model forward: pallas impl (fused attention + MLP kernels,
    interpret mode) vs xla impl, same params, deterministic."""
    key = jax.random.key(5)
    cfg_x = _cfg("xla")
    cfg_p = _cfg("pallas")
    params = vit3d.init(key, cfg_x)
    vol = jax.random.normal(jax.random.key(6), (2, 1, 20, 20, 20),
                            jnp.float32)
    logits_x, _ = vit3d.apply(params, vol, cfg_x)
    logits_p, _ = vit3d.apply(params, vol, cfg_p)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_x),
                               rtol=5e-4, atol=5e-4)

    # And gradients through a scalar loss.
    def loss(params, cfg):
        lg, _ = vit3d.apply(params, vol, cfg)
        return jnp.sum(jax.nn.log_softmax(lg)[:, 0])

    gx = jax.grad(loss)(params, cfg_x)
    gp = jax.grad(loss)(params, cfg_p)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
