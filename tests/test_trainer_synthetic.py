"""End-to-end: train the tiny 3D ViT on synthetic cubes to high accuracy.

The synthetic cube-position task is the reference's de-facto correctness
fixture (SURVEY §4): a working model + trainer reaches ~100% quickly.
"""

import numpy as np

from neurovit_tpu.data import get_datasets
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer


def test_synthetic_training_learns(tiny_config, tmp_path):
    config = dict(tiny_config)
    config.update({
        "TRAINING_EPOCHS": 3,
        "TRAINING_LEARNING_RATE": 1e-3,
        "GRADCAM_NUM_SAMPLES": 200,
        "DATASET_GENERATE": True,
    })
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    trainer.run()
    acc = trainer.evaluate_samples()
    # 8-way cube-position task on 160 train samples: must be near-perfect.
    assert acc > 0.9, f"synthetic accuracy too low: {acc}"


def test_grad_accumulation_equivalence(tiny_config):
    """k accumulation steps over k batches == one step over the merged batch
    (same LR), modulo Adam epsilon effects — checked loosely on loss descent."""
    import jax
    config = dict(tiny_config)
    config.update({"TRAINING_ACCUMULATION_STEP": 2, "TRAINING_EPOCHS": 1,
                   "DATASET_GENERATE": True, "GRADCAM_NUM_SAMPLES": 64})
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    batch = next(iter(trainer.dataloader))
    device_batch = trainer._device_batch(batch)[0]
    params_before = jax.tree.leaves(trainer.train_state["params"])[0].copy()
    # First micro-step: must NOT update params (accumulating).
    trainer.train_state, _ = trainer._train_step(trainer.train_state, device_batch)
    params_mid = jax.tree.leaves(trainer.train_state["params"])[0]
    np.testing.assert_allclose(np.asarray(params_before),
                               np.asarray(params_mid), atol=1e-7)
    # Second micro-step completes the accumulation window: params move.
    trainer.train_state, _ = trainer._train_step(trainer.train_state, device_batch)
    params_after = jax.tree.leaves(trainer.train_state["params"])[0]
    assert not np.allclose(np.asarray(params_before), np.asarray(params_after))


def test_host_bf16_transfer_step_equality(tiny_config):
    """TRAINING_HOST_TRANSFER_DTYPE: bf16 is bit-exact with bf16 compute:
    the host-side f32->bf16 cast is the same RNE rounding the model's
    first device op (volume.astype(bf16)) applies, so shipping half the
    bytes changes nothing downstream."""
    import jax
    import pytest
    base = dict(tiny_config)
    base.update({"TRAINING_EPOCHS": 1, "DATASET_GENERATE": True,
                 "GRADCAM_NUM_SAMPLES": 32, "TRAINING_PRECISION": "bf16"})
    ds_train, ds_val = get_datasets(base)

    def one_step(host_dtype):
        config = dict(base)
        config["TRAINING_HOST_TRANSFER_DTYPE"] = host_dtype
        model = NeuroEncoder(config)
        trainer = Trainer(config, model, ds_train, ds_val)
        batch = next(iter(trainer.val_dataloader))  # shuffle=False: fixed
        device_batch, zyx = trainer._device_batch(batch)
        ts, metrics = trainer._train_step(trainer.train_state,
                                          device_batch, zyx)
        leaf = np.asarray(jax.tree.leaves(ts["params"])[0])
        return float(metrics["loss"]), leaf

    loss32, leaf32 = one_step("f32")
    loss16, leaf16 = one_step("bf16")
    assert loss32 == loss16          # identical bits, not just close
    np.testing.assert_array_equal(leaf32, leaf16)

    # f32 compute refuses the lossy host cast.
    config = dict(base)
    config.update({"TRAINING_PRECISION": "f32",
                   "TRAINING_HOST_TRANSFER_DTYPE": "bf16"})
    with pytest.raises(ValueError, match="TRAINING_PRECISION"):
        Trainer(config, NeuroEncoder(config), ds_train, ds_val)


def test_validation_masked_metrics(tiny_config):
    """Padded final batch must not distort val accuracy/loss denominators."""
    config = dict(tiny_config)
    config.update({"TRAINING_BATCH_SIZE": 7, "DATASET_GENERATE": True,
                   "GRADCAM_NUM_SAMPLES": 40})  # val = 8 -> batches 7+1pad
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    total_valid = 0
    for batch in trainer.val_dataloader:
        total_valid += int(batch["valid"].sum())
    assert total_valid == len(ds_val)
    trainer.validate(epoch=0)  # must not crash; denominators checked above
