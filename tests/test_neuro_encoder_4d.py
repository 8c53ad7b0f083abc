"""4D mode: frozen encoder, temporal head, checkpoint bootstrap, masks."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import checkpoint as ckpt
from neurovit_tpu.training import state_dict as sd


def _cfg_4d(tiny_config, **kw):
    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",  # binary classes
                   "TRAINING_DROPOUT": 0.0, **kw})
    return config


def test_4d_forward_shapes(tiny_config):
    model = NeuroEncoder(_cfg_4d(tiny_config))
    assert model.is_4d and model.num_classes == 2
    variables = model.init(jax.random.key(0))
    x = jnp.zeros((2, 20, 20, 20, 5))       # [B, H, W, D, T]
    logits, aux = model.apply(variables["params"], x)
    assert logits.shape == (2, 2)


@pytest.mark.slow
def test_4d_volume_encoder_frozen(tiny_config):
    """Gradients w.r.t. the volume encoder must be exactly zero (stop_gradient
    == requires_grad=False, NeuroEncoder.py:34-36), and the optimizer mask
    must exclude it."""
    model = NeuroEncoder(_cfg_4d(tiny_config))
    variables = model.init(jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 20, 20, 20, 3),
                    jnp.float32)

    def loss(params):
        logits, _ = model.apply(params, x)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss)(variables["params"])
    enc_norm = sum(float(jnp.sum(jnp.abs(g)))
                   for g in jax.tree.leaves(grads["volume_encoder"]))
    head_norm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree.leaves(grads["temporal"])) + \
        sum(float(jnp.sum(jnp.abs(g)))
            for g in jax.tree.leaves(grads["projection"]))
    assert enc_norm == 0.0
    assert head_norm > 0.0

    mask = model.trainable_mask(variables["params"])
    assert not any(jax.tree.leaves(mask["volume_encoder"]))
    assert all(jax.tree.leaves(mask["temporal"]))


def test_4d_bootstrap_from_3d_checkpoint(tiny_config, tmp_path):
    """Train-3D -> save -> load into 4D with key filtering
    (NeuroEncoder.py:25-32 semantics)."""
    config3d = dict(tiny_config, DATASET_NAME="adni")  # binary head
    model3d = NeuroEncoder(config3d)
    v3d = model3d.init(jax.random.key(1))
    path = str(tmp_path / "best3d.pkl")
    sd.save(path, sd.to_state_dict(model3d, v3d["params"]))

    model4d = NeuroEncoder(_cfg_4d(tiny_config))
    v4d = model4d.init(jax.random.key(2))
    loaded = ckpt.load_pretrained_volume_encoder(model4d, v4d["params"], path)
    # Volume encoder weights must now equal the 3D run's...
    np.testing.assert_allclose(
        np.asarray(loaded["volume_encoder"]["cls_token"]),
        np.asarray(v3d["params"]["volume_encoder"]["cls_token"]))
    # ...while the 4D head keeps its own init (keys filtered out).
    np.testing.assert_allclose(
        np.asarray(loaded["projection"]["kernel"]),
        np.asarray(v4d["params"]["projection"]["kernel"]))


def test_4d_time_fold_equals_per_volume_encode(tiny_config):
    """Folding T into batch must encode each volume identically to separate
    3D passes (NeuroEncoder.py:54-57)."""
    config = _cfg_4d(tiny_config)
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    x = np.random.RandomState(1).randn(1, 20, 20, 20, 3).astype(np.float32)

    enc_batch, _, _ = model.encode_volume(
        variables["params"], variables["state"],
        jnp.asarray(x[0].transpose(3, 0, 1, 2)))  # [T, H, W, D]
    for t in range(3):
        single, _, _ = model.encode_volume(
            variables["params"], variables["state"],
            jnp.asarray(x[:, :, :, :, t]))
        np.testing.assert_allclose(np.asarray(enc_batch[t]),
                                   np.asarray(single[0]), rtol=1e-4,
                                   atol=1e-5)
