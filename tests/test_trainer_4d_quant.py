"""TRAINING_4D_ENCODER_QUANT: int8 frozen encoder during 4D training.

The 4D train step is ~98% frozen-encoder forward at its serving roofline
(BENCH.md "4D mode"); the int8 serving kernels are measured at +28-29% on
exactly that forward. This wires them into training behind an opt-in flag;
these tests are the convergence gate the roadmap required before the mode
can be recommended: the quantized run must reach the same val accuracy as
the bf16 run on the synthetic 4D task, and the bf16 weights must stay
pristine in params (checkpoint structure unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer

from test_feature_cache_4d import _config_4d


class Separable4D:
    """Learnable 4D task: the label moves a bright cube between two spatial
    positions (constant intensity shifts would die in the patch LayerNorm —
    the §2.1 patch-LN degeneracy — so the signal must be spatial structure,
    like the reference's synthetic cube task). The frozen random encoder
    maps the two positions to distinct 2-dim logit clusters; the temporal
    head + projection must separate them."""

    def __init__(self, n, grid=20, t=3, seed=0):
        self.n, self.grid, self.t, self.seed = n, grid, t, seed
        self.labels = np.random.RandomState(seed).randint(0, 2, n)

    def __len__(self):
        return self.n

    def sample(self, idx):
        rng = np.random.RandomState(self.seed * 1000 + idx)
        vol = 0.1 * rng.randn(self.grid, self.grid, self.grid,
                              self.t).astype(np.float32)
        lo, hi = (2, 10) if self.labels[idx] == 0 else (10, 18)
        vol[lo:hi, lo:hi, lo:hi, :] += 3.0
        return {"volume": vol, "label": int(self.labels[idx]),
                "subject": f"s{idx}", "timepoint": 0}


def _train(config, epochs=3):
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, Separable4D(12),
                      Separable4D(6, seed=1))
    val_losses = []
    for epoch in range(epochs):
        trainer.train(epoch)
        trainer.validate(epoch)
        val_losses.append(trainer.val_loss)
    trainer.val_losses = val_losses
    # final val accuracy from the eval sweep denominator-safe path
    correct = total = 0.0
    loader = (trainer._feat_val_dataloader
              if trainer._feature_cache is not None
              else trainer.val_dataloader)
    for batch in loader:
        if trainer._feature_cache is not None:
            host, _ = trainer._device_batch_features(batch)
            from neurovit_tpu.parallel import shard_batch
            db = shard_batch(host, trainer.mesh, replicate=True)
            with jax.set_mesh(trainer.mesh):
                m = trainer._feat_eval_step_jit(
                    trainer.train_state["params"], db)
        else:
            host, zyx = trainer._device_batch(batch)
            from neurovit_tpu.parallel import shard_batch
            db = shard_batch(host, trainer.mesh, replicate=True)
            m = trainer._eval_step(trainer.train_state["params"],
                                   trainer.train_state["model_state"], db,
                                   zyx)
        correct += float(m["correct"])
        total += float(m["count"])
    return trainer, correct / max(total, 1)


def test_quantized_4d_training_converges_like_bf16(tiny_config):
    """The roadmap's convergence gate: identical data/seed streams, bf16 vs
    int8 frozen encoder — the quantized run must reach the same val
    accuracy and track the loss trajectory within the quantization error
    budget. (Task note: with the reference's d_model=2 head, LayerNorm of a
    2-vector collapses to +-[1,-1]*gamma+beta, so the head plateaus — the
    reference's own '94% constant validation accuracy' quirk,
    /root/reference/configs/config.yaml:25; the gate is trajectory
    agreement at that plateau, not task mastery.)"""
    base_cfg = _config_4d(tiny_config, TRAINING_EPOCHS=3,
                          TRAINING_LEARNING_RATE=1e-3,
                          MODEL_TEMPORAL_DROPOUT=0.0, TRAINING_DROPOUT=0.0)
    quant_cfg = dict(base_cfg, TRAINING_4D_ENCODER_QUANT="int8")

    t_base, acc_base = _train(base_cfg)
    t_quant, acc_quant = _train(quant_cfg)
    assert "q8_volume_encoder" not in t_base.train_state["model_state"]
    qstate = t_quant.train_state["model_state"]["q8_volume_encoder"]
    assert jax.tree.leaves(qstate["blocks"]["qkv_q8"]["w"])[0].dtype == jnp.int8

    # the quantized encoder is actually engaged: features differ from bf16
    # by a small but NONZERO amount (~0.1-1% rel err)
    s = Separable4D(12).sample(0)
    x = jnp.asarray(s["volume"])[None]
    st = t_quant.train_state
    enc_q, _, _ = t_quant.model.encode_sequence(st["params"],
                                                st["model_state"], x)
    enc_b, _, _ = t_quant.model.encode_sequence(st["params"],
                                                {"volume_encoder": {}}, x)
    rel = float(jnp.linalg.norm(enc_q - enc_b) / jnp.linalg.norm(enc_b))
    assert 1e-5 < rel < 0.05, rel

    # the convergence gate: same val accuracy, losses within the
    # quantization error budget at every epoch
    assert acc_quant == acc_base
    np.testing.assert_allclose(t_quant.val_losses, t_base.val_losses,
                               rtol=0.02)

    # params keep the pristine bf16 encoder (checkpoints/export unchanged)
    fresh = NeuroEncoder(quant_cfg).init(
        jax.random.key(quant_cfg["TRAINING_SEED"]))
    for a, b in zip(
            jax.tree.leaves(fresh["params"]["volume_encoder"]),
            jax.tree.leaves(t_quant.train_state["params"]["volume_encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant4d_composes_with_feature_cache(tiny_config):
    """Quant + feature cache: the precompute pass encodes through the int8
    kernels (model_state carries the q8 copy), then epochs train on the
    cached int8-derived features."""
    config = _config_4d(tiny_config, TRAINING_EPOCHS=2,
                        TRAINING_4D_FEATURE_CACHE=True,
                        TRAINING_4D_ENCODER_QUANT="int8")
    trainer, acc = _train(config, epochs=2)
    assert trainer._feature_cache is not None
    assert np.isfinite(trainer.val_loss)

    # cached features must match a direct quantized encode (same state)
    ds = Separable4D(12)
    s = ds.sample(0)
    enc, _, _ = jax.jit(trainer.model.encode_sequence)(
        trainer.train_state["params"], trainer.train_state["model_state"],
        jnp.asarray(s["volume"])[None])
    np.testing.assert_allclose(trainer._feature_cache["train"].feats[0],
                               np.asarray(enc[0]), rtol=1e-5, atol=1e-6)


def test_quant4d_rejects_resnet_and_unknown_modes(tiny_config):
    config = _config_4d(tiny_config, TRAINING_4D_ENCODER_QUANT="int8",
                        MODEL_VOLUME_ENCODER="resnet", MODEL_RESNET_DEPTH=10)
    model = NeuroEncoder(config)
    with pytest.raises(ValueError, match="ViT"):
        Trainer(config, model, Separable4D(4), Separable4D(2, seed=1))

    config2 = _config_4d(tiny_config, TRAINING_4D_ENCODER_QUANT="int4")
    model2 = NeuroEncoder(config2)
    with pytest.raises(ValueError, match="int8"):
        Trainer(config2, model2, Separable4D(4), Separable4D(2, seed=1))


def test_quant4d_inert_for_3d(tiny_config):
    """The flag only acts in 4D mode (3D training differentiates the
    encoder; quantized GEMMs are serving-only)."""
    config = dict(tiny_config, TRAINING_4D_ENCODER_QUANT="int8",
                  DATASET_GENERATE=True, GRADCAM_NUM_SAMPLES=16)
    from neurovit_tpu.data import get_datasets
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    assert not trainer._quant4d
    assert "q8_volume_encoder" not in trainer.train_state["model_state"]
