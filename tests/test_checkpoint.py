"""Checkpointing: orbax full-state resume + state-dict filtering semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.data import get_datasets
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer
from neurovit_tpu.training import checkpoint as ckpt
from neurovit_tpu.training import state_dict as sd


def test_orbax_full_state_roundtrip(tiny_config, tmp_path):
    config = dict(tiny_config, DATASET_GENERATE=True, GRADCAM_NUM_SAMPLES=48)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)

    # One step so opt_state is non-trivial.
    batch = trainer._device_batch(next(iter(trainer.dataloader)))[0]
    trainer.train_state, _ = trainer._train_step(trainer.train_state, batch)
    trainer.train_state["epoch"] = jnp.asarray(3, jnp.int32)

    path = str(tmp_path / "ckpt" / "model-e3")
    ckpt.save_train_state(path, trainer.train_state, model)

    # Fresh trainer restores params + opt_state + epoch (true resume).
    trainer2 = Trainer(config, model, ds_train, ds_val)
    restored = ckpt.load_train_state(path, trainer2.train_state)
    assert int(restored["epoch"]) == 3
    for a, b in zip(jax.tree.leaves(trainer.train_state["params"]),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(trainer.train_state["opt_state"]),
                    jax.tree.leaves(restored["opt_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # Restored state must continue training without recompiling errors.
    trainer2.train_state = restored
    trainer2.train_state, metrics = trainer2._train_step(
        trainer2.train_state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_async_checkpoint_roundtrip(tiny_config, tmp_path):
    """Async epoch saves: the write overlaps the caller but commits by
    wait_for_async_saves, and the committed checkpoint restores to the
    same values as a synchronous save would."""
    config = dict(tiny_config, DATASET_GENERATE=True, GRADCAM_NUM_SAMPLES=48)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    batch = trainer._device_batch(next(iter(trainer.dataloader)))[0]
    trainer.train_state, _ = trainer._train_step(trainer.train_state, batch)

    path = str(tmp_path / "ckpt" / "model-e0")
    ckpt.save_train_state(path, trainer.train_state, model,
                          asynchronous=True)
    # Mutating the trainer's state after the call must not corrupt the
    # snapshot (the device->host copy is synchronous; only IO overlaps).
    expected = jax.tree.map(np.asarray,
                            jax.tree.leaves(trainer.train_state["params"]))
    trainer.train_state, _ = trainer._train_step(trainer.train_state, batch)
    ckpt.wait_for_async_saves()

    trainer2 = Trainer(config, model, ds_train, ds_val)
    restored = ckpt.load_train_state(path, trainer2.train_state)
    for a, b in zip(expected, jax.tree.leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    import os
    assert os.path.exists(path + ".state_dict.pkl")


def test_async_checkpoint_through_run(tiny_config, tmp_path):
    """TRAINING_ASYNC_CHECKPOINT=True through Trainer.run(): every epoch
    checkpoint is committed and resumable when run() returns."""
    config = dict(tiny_config, DATASET_GENERATE=True, GRADCAM_NUM_SAMPLES=48,
                  TRAINING_EPOCHS=2, TRAINING_ASYNC_CHECKPOINT=True,
                  GLOBAL_OUTPUT_DIR=str(tmp_path / "runs"))
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    trainer.run()
    import glob
    saves = sorted(glob.glob(str(tmp_path / "runs" / "*" / "model-e*")))
    dirs = [s for s in saves if not s.endswith(".pkl")]
    assert len(dirs) == 2
    trainer2 = Trainer(config, model, ds_train, ds_val)
    restored = ckpt.load_train_state(dirs[-1], trainer2.train_state)
    assert int(restored["epoch"]) == 2


def test_plateau_scheduler_state_resumes(tiny_config, tmp_path):
    """A resumed plateau-LR run keeps its best-val-loss / patience counters
    (and the reduced LR, which rides in opt_state) instead of restarting
    the patience window."""
    config = dict(tiny_config, DATASET_GENERATE=True, GRADCAM_NUM_SAMPLES=48,
                  TRAINING_LR_SCHEDULE="plateau",
                  TRAINING_PLATEAU_PATIENCE=2)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)

    # Simulate two epochs: one improvement then one non-improvement.
    trainer._plateau_step(0.5)
    trainer._plateau_step(0.9)
    assert trainer._plateau_best == 0.5 and trainer._plateau_bad_epochs == 1

    path = str(tmp_path / "ckpt" / "model-e0")
    ckpt.save_train_state(path, trainer._checkpoint_state(), model)

    trainer2 = Trainer(config, model, ds_train, ds_val)
    trainer2.restore(path)
    assert trainer2._plateau_best == 0.5
    assert trainer2._plateau_bad_epochs == 1
    # One more bad epoch (patience 2 -> 3rd bad triggers) then the trigger.
    trainer2._plateau_step(0.9)
    lr_before = trainer2._lr_fn(trainer2.train_state["opt_state"])
    trainer2._plateau_step(0.9)
    lr_after = trainer2._lr_fn(trainer2.train_state["opt_state"])
    assert lr_after == lr_before * 0.5


def test_state_dict_strict_false_skips_unknown(tiny_config):
    model = NeuroEncoder(tiny_config)
    params = model.init(jax.random.key(0))["params"]
    exported = sd.to_state_dict(model, params)
    exported["totally.unknown.key"] = np.zeros(3)
    merged = sd.load_into(model, params, exported, strict=False)
    assert merged is not None


def test_state_dict_shape_mismatch_raises(tiny_config):
    import pytest
    model = NeuroEncoder(tiny_config)
    params = model.init(jax.random.key(0))["params"]
    exported = sd.to_state_dict(model, params)
    key = "volume_encoder.vit3d.cls_token"
    exported[key] = np.zeros((1, 1, 999))
    with pytest.raises(ValueError):
        sd.load_into(model, params, exported, strict=False)


def test_resume_across_plateau_schedule_versions(tiny_config, tmp_path):
    """Checkpoints without a plateau entry (older saves / other schedules)
    must still resume under the plateau schedule, and vice versa."""
    base = dict(tiny_config, DATASET_GENERATE=True, GRADCAM_NUM_SAMPLES=48)
    ds_train, ds_val = get_datasets(base)
    model = NeuroEncoder(base)

    # Save WITHOUT plateau (constant schedule) -> resume WITH plateau.
    t_const = Trainer(base, model, ds_train, ds_val)
    p1 = str(tmp_path / "const" / "model-e0")
    ckpt.save_train_state(p1, t_const._checkpoint_state(), model)
    t_plat = Trainer(dict(base, TRAINING_LR_SCHEDULE="plateau"), model,
                     ds_train, ds_val)
    t_plat.restore(p1)
    assert t_plat._plateau_bad_epochs == 0          # fresh counters

    # Save WITH plateau -> resume under the constant schedule.
    t_plat._plateau_step(0.4)
    p2 = str(tmp_path / "plat" / "model-e0")
    ckpt.save_train_state(p2, t_plat._checkpoint_state(), model)
    t_const2 = Trainer(base, model, ds_train, ds_val)
    t_const2.restore(p2)                            # plateau entry dropped
    assert "plateau" not in t_const2.train_state
