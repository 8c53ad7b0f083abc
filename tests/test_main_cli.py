"""main.py entry point: train and inference modes end-to-end via argv."""

import pytest

import sys

import numpy as np
import yaml

pytestmark = pytest.mark.slow  # e2e tier; -m 'not slow' skips


def _write_config(tmp_path, tiny_config, **overrides):
    config = dict(tiny_config)
    config.update({
        "DATASET_GENERATE": True,
        "GRADCAM_NUM_SAMPLES": 64,
        "TRAINING_EPOCHS": 1,
        "GLOBAL_OUTPUT_DIR": str(tmp_path / "runs"),
        "BEST_MODEL_PATH": str(tmp_path / "best.pkl"),
        "GRADCAM_TRAIN_PATH": str(tmp_path / "gc_train.pkl"),
        "GRADCAM_VAL_PATH": str(tmp_path / "gc_val.pkl"),
        **overrides,
    })
    path = tmp_path / "config.yaml"
    path.write_text(yaml.dump(config))
    return str(path)


def _run_main(argv, monkeypatch, capsys):
    import main as main_mod
    monkeypatch.setattr(sys, "argv", ["main.py"] + argv)
    monkeypatch.chdir("/root/repo")
    main_mod.main()
    return capsys.readouterr().out


def test_main_train_mode(tiny_config, tmp_path, monkeypatch, capsys):
    cfg = _write_config(tmp_path, tiny_config)
    out = _run_main(["cli-test", "--wandb", "false", "--config", cfg],
                    monkeypatch, capsys)
    assert "Training mode enabled." in out
    assert "[VALIDATION]" in out
    assert "MODEL SAVED" in out
    # per-epoch orbax dir + state-dict pickle exist
    import glob
    assert glob.glob(str(tmp_path / "runs" / "*" / "model-e0"))
    assert glob.glob(str(tmp_path / "runs" / "*" / "model-e0.state_dict.pkl"))


def test_main_inference_mode(tiny_config, tmp_path, monkeypatch, capsys):
    import glob
    import shutil
    cfg = _write_config(tmp_path, tiny_config)
    _run_main(["prep", "--wandb", "false", "--config", cfg],
              monkeypatch, capsys)
    ckpt = glob.glob(str(tmp_path / "runs" / "*" / "model-e0.state_dict.pkl"))[0]
    shutil.copy(ckpt, str(tmp_path / "best.pkl"))

    out = _run_main(["--inference", "--wandb", "false", "--config", cfg],
                    monkeypatch, capsys)
    assert "Inference only." in out
    assert "Accuracy:" in out


def test_main_folds_mode(tiny_config, tmp_path, monkeypatch, capsys):
    """--folds k-fold CV loop (the reference's commented-out fold loop,
    main.py:127-131, made functional): trains each fold from the
    generate_folds indexes."""
    import pandas as pd

    from neurovit_tpu.data import nifti
    from neurovit_tpu.data.adni import ADNIDataset

    rng = np.random.RandomState(0)
    rows = []
    for i, age in enumerate([60, 61, 62, 63, 85, 86, 87, 88]):
        path = str(tmp_path / f"sub{i}.nii")
        nifti.save(path, rng.randn(21, 39, 21, 2).astype(np.float32))
        rows.append({"ID": i, "Subject": f"S{i:03d}", "Group": "CN",
                     "Sex": "F", "Age": age,
                     "Path_sMRI_brain": path, "Path_fMRI_brain": path})
    csv_path = str(tmp_path / "manifest.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    cfg_dict = {
        "DATASET_NAME": "adni", "DATASET_TASK": "gender",
        "DATASET_GENERATE": True, "DATASET_SPLIT_RATIO": 0.75,
        "ADNI_CSV_PATH": csv_path,
        "ADNI_TRAIN_PATH": str(tmp_path / "adni_train.pkl"),
        "ADNI_VAL_PATH": str(tmp_path / "adni_val.pkl"),
        "TRAINING_BATCH_SIZE": 4,
    }
    folds_dir = str(tmp_path / "folds")
    np.random.seed(0)
    ds = ADNIDataset(dict(tiny_config, **cfg_dict), mode="train",
                     generate_data=True)
    ds.generate_folds(folds_dir, k_folds=2)

    cfg_dict = dict(cfg_dict, DATASET_GENERATE=False,
                    DATASET_FOLDS_DIR=folds_dir)
    cfg = _write_config(tmp_path, tiny_config, **cfg_dict)
    out = _run_main(["cli-folds", "--wandb", "false", "--config", cfg,
                     "--folds", "2"], monkeypatch, capsys)
    assert "FOLD 1/2 training..." in out
    assert "FOLD 2/2 completed." in out
    assert out.count("[VALIDATION]") >= 2
