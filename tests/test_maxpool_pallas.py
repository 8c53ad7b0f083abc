"""Pallas argmax max-pool (ops/maxpool3d.py) vs the XLA golden path.

Reference op: `/root/reference/src/models/resnet_3d.py:161`
(`nn.MaxPool3d(kernel_size=3, stride=2, padding=1)`).  CPU runs exercise
the kernels in interpret mode; compiled Mosaic validation is
scripts/tpu_smoke.py / scripts/maxpool_bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu.models import resnet3d
from neurovit_tpu.ops import maxpool3d as mp


def _tie_free(rng, shape, dtype=np.float32):
    """A permutation of distinct values: no window ever ties, so the
    single-winner (pallas/torch) and equal-split (XLA autodiff)
    conventions must produce identical gradients."""
    n = int(np.prod(shape))
    return jnp.asarray(
        (rng.permutation(n).astype(dtype) / n).reshape(shape))


SHAPES = [(2, 9, 7, 10, 8),    # odd/even mix
          (1, 8, 8, 8, 4),     # all even
          (2, 5, 6, 9, 16),    # odd depth
          (3, 10, 5, 5, 8)]    # stem-like aspect


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_reduce_window(shape):
    x = _tie_free(np.random.default_rng(0), shape)
    ref = resnet3d.max_pool3d(x)
    out, amax = mp.max_pool3d_argmax(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert amax.dtype == jnp.int32
    assert int(amax.min()) >= 0 and int(amax.max()) <= 26


@pytest.mark.parametrize("shape", SHAPES)
def test_argmax_codes_point_at_window_max(shape):
    """Decode each code back to an input position and check it attains
    the window max (and lies inside the array, never in the -inf pad)."""
    x = _tie_free(np.random.default_rng(1), shape)
    out, amax = mp.max_pool3d_argmax(x)
    xn, on, an = np.asarray(x), np.asarray(out), np.asarray(amax)
    b, d, h, w, c = xn.shape
    idx = np.stack(np.meshgrid(*map(np.arange, on.shape), indexing="ij"))
    k = an
    pos = [2 * idx[1] - 1 + k // 9,
           2 * idx[2] - 1 + (k // 3) % 3,
           2 * idx[3] - 1 + k % 3]
    for p, lim in zip(pos, (d, h, w)):
        assert (p >= 0).all() and (p < lim).all()
    vals = xn[idx[0], pos[0], pos[1], pos[2], idx[4]]
    np.testing.assert_array_equal(vals, on)


@pytest.mark.parametrize("shape", SHAPES)
def test_grad_matches_autodiff(shape):
    rng = np.random.default_rng(2)
    x = _tie_free(rng, shape)
    g = jnp.asarray(rng.standard_normal(
        resnet3d.max_pool3d(x).shape).astype(np.float32))
    d_ref = jax.grad(lambda v: jnp.vdot(resnet3d.max_pool3d(v), g))(x)
    d_new = jax.grad(lambda v: jnp.vdot(mp.max_pool3d_pallas(v), g))(x)
    np.testing.assert_allclose(np.asarray(d_new), np.asarray(d_ref),
                               atol=1e-6)


def test_grad_under_jit_and_bf16():
    # <= 256 distinct small integers: exactly representable in bf16, so
    # the permutation stays tie-free after the cast.
    rng = np.random.default_rng(3)
    shape = (1, 5, 6, 8, 1)
    x = jnp.asarray(rng.permutation(int(np.prod(shape)))
                    .reshape(shape)).astype(jnp.bfloat16)
    g = jnp.ones(resnet3d.max_pool3d(x).shape, jnp.bfloat16)

    @jax.jit
    def grads(v):
        return (jax.grad(lambda a: jnp.vdot(
                    resnet3d.max_pool3d(a).astype(jnp.float32),
                    g.astype(jnp.float32)))(v),
                jax.grad(lambda a: jnp.vdot(
                    mp.max_pool3d_pallas(a).astype(jnp.float32),
                    g.astype(jnp.float32)))(v))

    d_ref, d_new = grads(x)
    assert d_new.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(d_new, np.float32),
                                  np.asarray(d_ref, np.float32))


def test_tie_routes_full_gradient_to_one_winner():
    """On an all-equal window the pallas path follows torch (one winner
    takes the whole cotangent) where XLA's autodiff splits it; either
    way the total routed gradient is conserved."""
    x = jnp.zeros((1, 4, 4, 4, 1), jnp.float32)
    g = jnp.ones(resnet3d.max_pool3d(x).shape, jnp.float32)
    d = jax.grad(lambda v: jnp.vdot(mp.max_pool3d_pallas(v), g))(x)
    dn = np.asarray(d)
    assert set(np.unique(dn)) <= {0.0, 1.0}
    assert dn.sum() == float(np.asarray(g).sum())


def test_resnet_stem_dispatch(monkeypatch):
    """NEUROVIT_MAXPOOL=pallas runs the full ResNet forward+backward with
    the kernel pool and matches the XLA-pool loss/gradients on tie-free
    activations (continuous post-BN values never tie away from zero)."""
    cfg = resnet3d.ResNetConfig(depth=10, n_input_channels=1, n_classes=2,
                                widen_factor=0.25)
    tree = resnet3d.init(jax.random.PRNGKey(0), cfg)
    params, state = tree["params"], tree["state"]
    x = _tie_free(np.random.default_rng(4), (2, 1, 16, 16, 16))

    def loss(p):
        logits, _ = resnet3d.apply(p, state, x, cfg, train=True)
        return jnp.sum(logits ** 2)

    monkeypatch.setenv("NEUROVIT_MAXPOOL", "xla")
    l_ref, g_ref = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("NEUROVIT_MAXPOOL", "pallas")
    l_new, g_new = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l_new), float(l_ref), rtol=1e-6)
    # The two pools route bit-identical per-element gradients, but the
    # downstream conv/BN backward contracts them in a different order —
    # allow f32 accumulation noise.
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
