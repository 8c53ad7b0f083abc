"""main.py entry point: train and inference modes end-to-end via argv."""

import sys

import numpy as np
import yaml


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
