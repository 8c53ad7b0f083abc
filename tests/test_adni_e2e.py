"""End-to-end ADNI path: CSV manifest -> index -> loader -> Trainer."""

import pytest

import numpy as np
import pandas as pd

from neurovit_tpu.data import get_datasets, nifti
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer

pytestmark = pytest.mark.slow  # e2e tier; -m 'not slow' skips


def test_adni_train_and_inference_e2e(tiny_config, tmp_path):
    rng = np.random.RandomState(0)
    rows = []
    ages = [60, 61, 62, 63, 85, 86, 87, 88]
    for i, age in enumerate(ages):
        path = str(tmp_path / f"sub{i}.nii")
        # (21, 39, 21, T): crop [1:, 10:-9, 1:] -> (20, 20, 20).
        series = rng.randn(21, 39, 21, 2).astype(np.float32)
        # Age-correlated signal so the model can learn quickly.
        series += (1.5 if age > 70 else -1.5)
        nifti.save(path, series)
        rows.append({"ID": i, "Subject": f"S{i:03d}", "Group": "CN",
                     "Sex": "F", "Age": age,
                     "Path_sMRI_brain": path, "Path_fMRI_brain": path})
    csv_path = str(tmp_path / "manifest.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    config = dict(tiny_config)
    config.update({
        "DATASET_NAME": "adni",
        "DATASET_TASK": "age",
        "DATASET_GENERATE": True,
        "DATASET_SPLIT_RATIO": 0.75,
        "ADNI_CSV_PATH": csv_path,
        "ADNI_TRAIN_PATH": str(tmp_path / "adni_train.pkl"),
        "ADNI_VAL_PATH": str(tmp_path / "adni_val.pkl"),
        "TRAINING_BATCH_SIZE": 4,
        "TRAINING_EPOCHS": 2,
        "TRAINING_LEARNING_RATE": 1e-3,
    })
    np.random.seed(0)
    ds_train, ds_val = get_datasets(config)
    assert len(ds_train) > 0 and len(ds_val) > 0
    model = NeuroEncoder(config)
    assert model.num_classes == 2
    trainer = Trainer(config, model, ds_train, ds_val)
    trainer.run()
    # Binary age task with a strong injected signal: must beat chance well.
    acc = trainer.evaluate_samples()
    assert acc >= 0.5
    assert np.isfinite(trainer.val_loss)
