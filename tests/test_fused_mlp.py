"""Fused MLP block kernel vs the XLA golden composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu import nn
from neurovit_tpu.models import vit3d
from neurovit_tpu.ops import fused_mlp


def _params(key, dim, hid, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "mlp_norm": nn.layer_norm_init(dim, dtype),
        "fc1": nn.linear_init(k1, dim, hid, dtype=dtype),
        "fc2": nn.linear_init(k2, hid, dim, dtype=dtype),
    }


def _xla_golden(params, x):
    h = nn.layer_norm(params["mlp_norm"], x)
    h = nn.gelu(nn.linear(params["fc1"], h))
    return nn.linear(params["fc2"], h) + x


@pytest.mark.parametrize("shape,dim,hid", [
    ((2, 65, 128), 128, 256),     # M=130: pads to one 512-row block
    ((1, 1024, 256), 256, 512),   # M=1024: two blocks
])
def test_forward_matches_xla(shape, dim, hid):
    params = _params(jax.random.key(0), dim, hid)
    # Perturb LN params away from identity so the LN path is exercised.
    params["mlp_norm"]["scale"] = params["mlp_norm"]["scale"] * 1.3
    params["mlp_norm"]["bias"] = params["mlp_norm"]["bias"] + 0.1
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    got = fused_mlp.fused_mlp_block(params, x)
    want = _xla_golden(params, x)
    # erf is the A&S 7.1.26 approximation in-kernel (|err| <= 1.5e-7).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    dim, hid = 128, 256
    params = _params(jax.random.key(1), dim, hid)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 65, dim), jnp.float32)
    cot = jnp.asarray(np.random.RandomState(2).randn(2, 65, dim), jnp.float32)

    def loss_fused(p, v):
        return jnp.sum(fused_mlp.fused_mlp_block(p, v) * cot)

    def loss_xla(p, v):
        return jnp.sum(_xla_golden(p, v) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_bf16_forward_close_to_f32_golden():
    dim, hid = 128, 256
    params = _params(jax.random.key(2), dim, hid)
    x32 = jnp.asarray(np.random.RandomState(3).randn(2, 64, dim), jnp.float32)
    got = fused_mlp.fused_mlp_block(
        jax.tree.map(lambda p: p, params), x32.astype(jnp.bfloat16))
    want = _xla_golden(params, x32)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_vit_block_dispatch_matches_xla_impl():
    """Full ViT forward: pallas impl (fused MLP + interpretable attention
    path) equals the xla impl in deterministic mode."""
    cfg_x = vit3d.ViTConfig(
        image_size=16, image_patch_size=4, frames=16, frame_patch_size=4,
        num_classes=8, dim=128, depth=2, heads=4, dim_head=32, mlp_dim=256,
        channels=1, pool="cls", impl="xla")
    cfg_p = vit3d.ViTConfig(**{**cfg_x.__dict__, "impl": "pallas"})
    params = vit3d.init(jax.random.key(0), cfg_x)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 16, 16, 16),
                    jnp.float32)
    out_x, _ = vit3d.apply(params, x, cfg_x)
    out_p, _ = vit3d.apply(params, x, cfg_p)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=5e-4, atol=5e-4)


def test_erf_approximation_accuracy():
    import scipy.special as sp
    xs = np.linspace(-6, 6, 20001).astype(np.float32)
    approx = np.asarray(fused_mlp._erf(jnp.asarray(xs)))
    exact = sp.erf(xs.astype(np.float64))
    # A&S 7.1.26 is |err|<=1.5e-7 in exact arithmetic; f32 evaluation adds
    # ~3e-7 of rounding. Both are far below bf16 resolution (~7.8e-3).
    assert np.max(np.abs(approx - exact)) < 1e-6
