"""Preemption-safe checkpointing: SIGTERM mid-training saves a resumable
full train state (trainer.run preempt path)."""

import os
import signal

import numpy as np
import pytest

from neurovit_tpu.data import get_datasets
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer


def _find_run_dir(output_dir):
    runs = sorted(p for d in os.listdir(output_dir)
                  if os.path.isdir(p := os.path.join(output_dir, d)))
    assert runs, "no run dir created"
    return runs[-1]


@pytest.mark.slow
def test_sigterm_mid_epoch_saves_resumable_state(tiny_config):
    config = dict(tiny_config, TRAINING_EPOCHS=4, DATASET_GENERATE=True,
                  TRAINING_LEARNING_RATE=1e-3, GRADCAM_NUM_SAMPLES=160)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)

    # Deliver a real SIGTERM from inside the batch loop: python runs the
    # handler on the main thread at the next bytecode boundary, i.e. before
    # the loop's preempt check on the following iteration.
    real_step = trainer._train_step
    calls = {"n": 0}

    def step_then_sigterm(*args, **kwargs):
        out = real_step(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    trainer._train_step = step_then_sigterm
    default_handler = signal.getsignal(signal.SIGTERM)
    trainer.run()                       # must return, not die
    # Handler restored after run().
    assert signal.getsignal(signal.SIGTERM) is default_handler
    # Only ~2 steps ran (preempted in epoch 0, no full run).
    assert calls["n"] < 5

    run_dir = _find_run_dir(config["GLOBAL_OUTPUT_DIR"])
    preempt = os.path.join(run_dir, "model-preempt")
    assert os.path.exists(preempt), "preempt checkpoint missing"

    # Resume: epoch counter still points at the interrupted epoch, and the
    # resumed trainer completes the run.
    trainer2 = Trainer(config, model, ds_train, ds_val)
    trainer2.restore(preempt)
    assert int(trainer2.train_state["epoch"]) == 0
    trainer2.run()
    acc = trainer2.evaluate_samples()
    assert acc > 0.5                    # actually trained after resume


def test_preemption_save_disabled(tiny_config):
    """TRAINING_PREEMPTION_SAVE: False leaves signal handlers untouched."""
    config = dict(tiny_config, TRAINING_EPOCHS=1, DATASET_GENERATE=True,
                  TRAINING_PREEMPTION_SAVE=False)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)

    seen = []
    real_step = trainer._train_step

    def spy_step(*args, **kwargs):
        seen.append(signal.getsignal(signal.SIGTERM))
        return real_step(*args, **kwargs)

    trainer._train_step = spy_step
    before = signal.getsignal(signal.SIGTERM)
    trainer.run()
    assert all(h is before for h in seen)


def test_request_preempt_between_epochs(tiny_config):
    """A preempt request landing during validation exits after the normal
    per-epoch save, without a duplicate preempt checkpoint."""
    config = dict(tiny_config, TRAINING_EPOCHS=3, DATASET_GENERATE=True)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)

    real_validate = trainer.validate

    def validate_then_preempt(epoch):
        real_validate(epoch)
        trainer.request_preempt()

    trainer.validate = validate_then_preempt
    trainer.run()
    run_dir = _find_run_dir(config["GLOBAL_OUTPUT_DIR"])
    assert os.path.exists(os.path.join(run_dir, "model-e0"))
    assert not os.path.exists(os.path.join(run_dir, "model-e1"))
    assert not os.path.exists(os.path.join(run_dir, "model-preempt"))
    # epoch advanced past the completed epoch -> resume continues at 1.
    assert int(trainer.train_state["epoch"]) == 1
