"""ResNet volume-encoder training: BN state updates through the jitted step."""

import pytest

import jax
import numpy as np

from neurovit_tpu.data import get_datasets
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer

pytestmark = pytest.mark.slow  # e2e tier; -m 'not slow' skips


def test_resnet_trainer_updates_bn_state(tiny_config):
    config = dict(tiny_config)
    config.update({"MODEL_VOLUME_ENCODER": "resnet", "MODEL_RESNET_DEPTH": 10,
                   "DATASET_NAME": "gradcam", "DATASET_GENERATE": True,
                   "GRADCAM_NUM_SAMPLES": 48, "TRAINING_EPOCHS": 1})
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    assert model.encoder_kind == "resnet"
    trainer = Trainer(config, model, ds_train, ds_val)

    bn_before = np.asarray(jax.tree.leaves(
        trainer.train_state["model_state"])[0]).copy()
    batch = trainer._device_batch(next(iter(trainer.dataloader)))[0]
    from neurovit_tpu.parallel import shard_batch
    device_batch = shard_batch(batch, trainer.mesh)
    trainer.train_state, metrics = trainer._train_step(
        trainer.train_state, device_batch)
    assert np.isfinite(float(metrics["loss"]))
    bn_after = np.asarray(jax.tree.leaves(
        trainer.train_state["model_state"])[0])
    # Running BN statistics must move in train mode.
    assert not np.allclose(bn_before, bn_after)

    # Eval step runs with the updated stats and leaves them unchanged.
    m = trainer._eval_step(trainer.train_state["params"],
                           trainer.train_state["model_state"], device_batch)
    assert np.isfinite(float(m["loss"]))
    trainer.validate(0)
