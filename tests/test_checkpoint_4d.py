"""Orbax resume for the 4D trainer (masked optimizer state, frozen subtree)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer
from neurovit_tpu.training import checkpoint as ckpt
from test_trainer_4d import Synthetic4D

pytestmark = pytest.mark.slow  # e2e tier; -m 'not slow' skips


def test_4d_orbax_roundtrip(tiny_config, tmp_path):
    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_BATCH_SIZE": 2,
                   "TRAINING_ACCUMULATION_STEP": 2})
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, Synthetic4D(4), Synthetic4D(2, seed=1))

    from neurovit_tpu.parallel import shard_batch
    batch = shard_batch(trainer._device_batch(next(iter(trainer.dataloader)))[0],
                        trainer.mesh, replicate=True)
    trainer.train_state, _ = trainer._train_step(trainer.train_state, batch)
    trainer.train_state["epoch"] = trainer._replicate(jnp.asarray(5, jnp.int32))

    path = str(tmp_path / "ckpt4d" / "model-e5")
    ckpt.save_train_state(path, trainer.train_state, model)

    trainer2 = Trainer(config, model, Synthetic4D(4), Synthetic4D(2, seed=1))
    restored = ckpt.load_train_state(path, trainer2.train_state)
    assert int(restored["epoch"]) == 5
    for a, b in zip(jax.tree.leaves(trainer.train_state["params"]),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    trainer2.train_state = restored
    trainer2.train_state, metrics = trainer2._train_step(
        trainer2.train_state, batch)
    assert np.isfinite(float(metrics["loss"]))
