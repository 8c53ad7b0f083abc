"""Grad-CAM localization: a trained cube classifier's CAM must concentrate
attention mass on the cube region (the reference's visual QA, automated)."""

import pytest

import numpy as np

from neurovit_tpu.data import get_datasets
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer

pytestmark = pytest.mark.slow  # e2e tier; -m 'not slow' skips


def test_cam_localizes_cube_after_training(tiny_config):
    config = dict(tiny_config)
    config.update({"TRAINING_EPOCHS": 4, "TRAINING_LEARNING_RATE": 1e-3,
                   "GRADCAM_NUM_SAMPLES": 160, "DATASET_GENERATE": True,
                   "GRADCAM_THRESHOLD": 20})
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    trainer.run()
    acc = trainer.evaluate_samples()
    assert acc > 0.8, f"model did not learn ({acc}); CAM check meaningless"

    variables = {"params": trainer.train_state["params"]}
    hits, total = 0, 0
    for idx in range(6):
        sample = ds_val.sample(idx)
        cam, cls = model.get_attention_map(variables, sample["volume"])
        cube = sample["volume"] == 1.0
        inside = cam[cube].mean()
        outside = cam[~cube].mean()
        total += 1
        if inside > outside:
            hits += 1
    # Majority of samples must put more attention inside the cube than out.
    assert hits >= total // 2 + 1, f"CAM localization weak: {hits}/{total}"
