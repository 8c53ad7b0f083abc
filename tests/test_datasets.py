"""ADNI 3D/4D + Pain datasets over synthetic NIfTI files + CSV manifests."""

import os

import numpy as np
import pandas as pd
import pytest

from neurovit_tpu.data import nifti


@pytest.fixture
def fake_adni(tmp_path):
    """12 subjects x 1 row, each with a small 4D NIfTI (91,109,91 shrunk to
    12,28,12 x 3 timepoints keeps the reference's crop indices valid)."""
    rng = np.random.RandomState(0)
    rows = []
    ages = [60, 62, 63, 65, 66, 67, 80, 82, 83, 85, 86, 88]
    for i, age in enumerate(ages):
        path = str(tmp_path / f"sub{i}.nii")
        nifti.save(path, rng.randn(12, 28, 12, 3).astype(np.float32))
        rows.append({
            "ID": i, "Subject": f"S{i:03d}",
            "Group": "CN" if i % 2 == 0 else "AD",
            "Sex": "F" if i % 2 == 0 else "M", "Age": age,
            "Path_sMRI_brain": path, "Path_fMRI_brain": path,
        })
    csv_path = str(tmp_path / "manifest.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return {
        "ADNI_CSV_PATH": csv_path,
        "ADNI_TRAIN_PATH": str(tmp_path / "adni_train.pkl"),
        "ADNI_VAL_PATH": str(tmp_path / "adni_val.pkl"),
        "ADNI_4D_TRAIN_PATH": str(tmp_path / "adni4d_train.pkl"),
        "ADNI_4D_VAL_PATH": str(tmp_path / "adni4d_val.pkl"),
        "DATASET_SPLIT_RATIO": 0.85,
        "DATASET_TASK": "age",
        "DATASET_TRANSFORMS": False,
        "TRAINING_VIT_INPUT_SIZE": 11,
        "TRAINING_SEED": 42,
    }


def test_adni_3d_generate_and_sample(fake_adni):
    from neurovit_tpu.data.adni import ADNIDataset
    np.random.seed(0)
    train = ADNIDataset(fake_adni, mode="train", generate_data=True)
    val = ADNIDataset(fake_adni, mode="val")
    # Q1/Q4 age filter keeps 3 young (<q25=64.5) + 3 old (>q75=83.5)
    # subjects; 6 subjects x 3 timepoints, split at the subject level.
    assert len(train) + len(val) == 18
    assert len(train) % 3 == 0 and len(val) % 3 == 0
    train_subjects = {s[0] for s in train.data}
    val_subjects = {s[0] for s in val.data}
    assert not train_subjects & val_subjects   # subject-level split
    s = train.sample(0)
    assert s["volume"].shape == (11, 9, 11)    # [1:, 10:-9, 1:] crop
    assert abs(s["volume"].mean()) < 1e-4      # z-scored
    assert s["label"] in (0, 1)
    assert s["age_group"] == (0 if s["age"] < 69 else 1)


def test_adni_task_label_selection(fake_adni):
    from neurovit_tpu.data.adni import ADNIDataset
    np.random.seed(0)
    ADNIDataset(fake_adni, mode="train", generate_data=True)
    cfg = dict(fake_adni, DATASET_TASK="gender")
    ds = ADNIDataset(cfg, mode="train")
    s = ds.sample(0)
    assert s["label"] == s["gender"]
    cfg = dict(fake_adni, DATASET_TASK="ad")
    s = ADNIDataset(cfg, mode="train").sample(0)
    assert s["label"] == s["group"]


def test_adni_4d(fake_adni):
    from neurovit_tpu.data.adni4d import ADNIDataset4D
    np.random.seed(0)
    train = ADNIDataset4D(fake_adni, mode="train", generate_data=True)
    assert len(train) > 0
    s = train.sample(0)
    assert s["volume"].shape == (11, 9, 11, 3)   # full time series
    assert s["label"] in (0, 1)
    # age band filter honored (DatasetADNI_4D.py:29)
    assert all(row[4] < 69 or row[4] > 78 for row in train.data)


def test_pain_dataset(tmp_path):
    from neurovit_tpu.data.pain import PainDataset
    rng = np.random.RandomState(1)
    rows = []
    for i in range(6):
        path = str(tmp_path / f"pain{i}.nii")
        nifti.save(path, rng.randn(12, 28, 12, 2).astype(np.float32))
        rows.append({"Subject": f"P{i}", "Path_fMRI": path,
                     "Gender": "F" if i % 2 else "M", "Age": 30 + i,
                     "Age_Group": 1 + (i % 2),
                     "Pain_Distraction_Group": i % 2})
    csv_path = str(tmp_path / "pain.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    config = {
        "PAIN_CSV_PATH": csv_path,
        "PAIN_TRAIN_PKL_PATH": str(tmp_path / "pain_train.pkl"),
        "PAIN_VAL_PKL_PATH": str(tmp_path / "pain_val.pkl"),
        "DATASET_SPLIT_RATIO": 0.7,
    }
    np.random.seed(0)
    train = PainDataset(config, mode="train", generate_data=True)
    val = PainDataset(config, mode="val")
    assert len(train) + len(val) == 12
    s = train.sample(0)
    assert s["volume"].shape == (11, 9, 11)
    assert s["label"] == s["pain_group"]
    assert s["age_group"] in (0, 1)              # 1,2 -> 0,1


def test_adni_folds(fake_adni, tmp_path):
    from neurovit_tpu.data.adni import ADNIDataset
    np.random.seed(0)
    ds = ADNIDataset(fake_adni, mode="train", generate_data=True)
    fold_base = str(tmp_path / "folds")
    ds.generate_folds(fold_base, k_folds=3)
    for fold in range(1, 4):
        assert os.path.exists(os.path.join(fold_base, f"fold_{fold}",
                                           "train_data.pkl"))
        assert os.path.exists(os.path.join(fold_base, f"fold_{fold}",
                                           "val_data.pkl"))
