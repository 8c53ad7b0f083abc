"""Sweep engine: sweep.yaml grammar sampling + trial loop."""

import numpy as np
import yaml

from neurovit_tpu.config import load_config
from neurovit_tpu.training.sweep import run_sweep, sample_params

SPEC = {
    "seed": {"value": 42},
    "learning_rate": {"min": 1e-5, "max": 1e-2},
    "batch_size": {"values": [16, 32, 64]},
    "dropout": {"values": [0.1, 0.2]},
}


def test_sample_params_respects_spec():
    rng = np.random.RandomState(0)
    for _ in range(50):
        p = sample_params(SPEC, rng)
        assert p["seed"] == 42
        assert 1e-5 <= p["learning_rate"] <= 1e-2
        assert p["batch_size"] in (16, 32, 64)
        assert p["dropout"] in (0.1, 0.2)


def test_log_uniform_for_positive_ranges():
    rng = np.random.RandomState(1)
    draws = [sample_params(SPEC, rng)["learning_rate"] for _ in range(500)]
    # log-uniform: ~half the draws below the geometric mean sqrt(lo*hi).
    geo_mean = (1e-5 * 1e-2) ** 0.5
    frac_below = np.mean([d < geo_mean for d in draws])
    assert 0.4 < frac_below < 0.6


def test_run_sweep_tracks_best(tmp_path):
    sweep_yaml = tmp_path / "sweep.yaml"
    sweep_yaml.write_text(yaml.dump({
        "method": "random",
        "metric": {"goal": "minimize", "name": "val_loss"},
        "parameters": {"learning_rate": {"min": 1e-4, "max": 1e-1},
                       "batch_size": {"values": [8, 16]}},
    }))
    base = load_config(overrides={"GLOBAL_OUTPUT_DIR": str(tmp_path)})

    calls = []

    def fake_train(config):
        # pretend loss improves with smaller lr; checks overrides reached us
        calls.append(config["TRAINING_LEARNING_RATE"])
        assert config["TRAINING_BATCH_SIZE"] in (8, 16)
        return {"val_loss": config["TRAINING_LEARNING_RATE"]}

    best = run_sweep(base, fake_train, str(sweep_yaml), count=5)
    assert best["trials"] == 5
    assert best["best_metric"] == min(calls)
    assert (tmp_path / "sweep_results.jsonl").exists()


def test_bayes_method_concentrates_via_tpe(tmp_path):
    """method: bayes runs the local TPE surrogate: after the random warmup,
    proposals concentrate near the incumbent optimum of a smooth objective
    (log-distance to the optimum shrinks vs the warmup trials)."""
    sweep_yaml = tmp_path / "sweep.yaml"
    sweep_yaml.write_text(yaml.dump({
        "method": "bayes",
        "metric": {"goal": "minimize", "name": "val_loss"},
        "parameters": {"learning_rate": {"min": 1e-5, "max": 1e-1}},
    }))
    base = load_config(overrides={"GLOBAL_OUTPUT_DIR": str(tmp_path)})
    opt = 1e-3
    lrs = []

    def fake_train(config):
        lr = config["TRAINING_LEARNING_RATE"]
        lrs.append(lr)
        return {"val_loss": (np.log(lr) - np.log(opt)) ** 2}

    best = run_sweep(base, fake_train, str(sweep_yaml), count=24)
    assert best["trials"] == 24
    dist = [abs(np.log(lr) - np.log(opt)) for lr in lrs]
    warmup, guided = np.mean(dist[:8]), np.mean(dist[-8:])
    assert guided < warmup, (warmup, guided)
    assert best["best_metric"] < 0.5   # within ~2x of the optimal lr
