"""wandb-present code paths, exercised via a fake in-process wandb module.

The image has no wandb; the reference's online-logging and sweep-agent flows
(``/root/reference/main.py:133-157``, ``src/Trainer.py:89-99``) are covered
here by injecting a stub into sys.modules and asserting the same call
sequence the real package would see.
"""

import sys
import types

import pytest


BASE_KEYS = {  # minimal schema accepted by config.validate_config
    "TRAINING_SEED": 0, "TRAINING_DIM": 3, "TRAINING_EPOCHS": 1,
    "TRAINING_BATCH_SIZE": 99, "TRAINING_LEARNING_RATE": 99.0,
    "TRAINING_VIT_INPUT_SIZE": 90, "TRAINING_VIT_PATCH_SIZE": 9,
    "DATASET_NAME": "gradcam",
}


class _FakeRun:
    def __init__(self, wandb):
        self._wandb = wandb

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def make_fake_wandb():
    wandb = types.ModuleType("wandb")
    wandb.calls = {"init": [], "log": [], "finish": 0, "sweep": [],
                   "agent": []}
    wandb.config = {}

    def init(**kwargs):
        wandb.calls["init"].append(kwargs)
        return _FakeRun(wandb)

    def log(record):
        wandb.calls["log"].append(dict(record))

    def finish():
        wandb.calls["finish"] += 1

    def sweep(sweep_cfg, project=None):
        wandb.calls["sweep"].append({"cfg": sweep_cfg, "project": project})
        return "fake-sweep-id"

    def agent(sweep_id, function=None, count=1):
        # Deterministic agent: always picks the first choice of each param,
        # publishing it via wandb.config like the real agent does.
        wandb.calls["agent"].append({"sweep_id": sweep_id, "count": count})
        space = wandb.calls["sweep"][-1]["cfg"]["parameters"]
        for _ in range(count):
            wandb.config = {
                name: (spec["values"][0] if "values" in spec
                       else spec.get("value", spec.get("min")))
                for name, spec in space.items()
            }
            function()

    wandb.init, wandb.log, wandb.finish = init, log, finish
    wandb.sweep, wandb.agent = sweep, agent
    return wandb


@pytest.fixture
def fake_wandb(monkeypatch):
    wandb = make_fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", wandb)
    return wandb


def test_metric_logger_online_mode(fake_wandb, tmp_path):
    from neurovit_tpu.training.metrics import MetricLogger

    config = {"WANDB_ENABLED": True, "NAME": "unit",
              "GLOBAL_OUTPUT_DIR": str(tmp_path)}
    logger = MetricLogger(config, run_dir=str(tmp_path))
    # Reference init contract: project NeuroViT, online mode, named run
    # (main.py:133-138).
    (init_kwargs,) = fake_wandb.calls["init"]
    assert init_kwargs["project"] == "NeuroViT"
    assert init_kwargs["mode"] == "online"
    assert init_kwargs["name"] == "unit"

    logger.log({"epoch": 0, "train_loss": 1.25})
    logger.finish()
    (rec,) = fake_wandb.calls["log"]
    assert rec == {"epoch": 0, "train_loss": 1.25}  # _ts stripped for wandb
    assert fake_wandb.calls["finish"] == 1
    # JSONL mirror is written regardless of wandb.
    assert (tmp_path / "metrics.jsonl").read_text().count("train_loss") == 1


def test_metric_logger_disabled_skips_wandb(fake_wandb, tmp_path):
    from neurovit_tpu.training.metrics import MetricLogger

    logger = MetricLogger({"WANDB_ENABLED": False}, run_dir=str(tmp_path))
    logger.log({"epoch": 0})
    logger.finish()
    assert fake_wandb.calls["init"] == []
    assert fake_wandb.calls["log"] == []


def test_sweep_wandb_agent_branch(fake_wandb, tmp_path):
    """run_sweep drives wandb.sweep + wandb.agent when wandb is enabled,
    mapping lowercase sweep names onto UPPERCASE config keys (the reference
    never did — quirk §2.1.5)."""
    import yaml

    from neurovit_tpu.training.sweep import run_sweep

    sweep_cfg = {
        "method": "random",
        "metric": {"name": "val_loss", "goal": "minimize"},
        "parameters": {
            "learning_rate": {"values": [0.001, 0.01]},
            "batch_size": {"values": [4]},
        },
    }
    sweep_path = tmp_path / "sweep.yaml"
    sweep_path.write_text(yaml.safe_dump(sweep_cfg))

    seen_configs = []

    def train_fn(config):
        seen_configs.append(config)
        return {"val_loss": 0.5}

    base = dict(BASE_KEYS, WANDB_ENABLED=True,
                GLOBAL_OUTPUT_DIR=str(tmp_path))
    best = run_sweep(base, train_fn, str(sweep_path), count=2)

    (sweep_call,) = fake_wandb.calls["sweep"]
    assert sweep_call["project"] == "NeuroViT_Sweep"  # main.py:153-155
    (agent_call,) = fake_wandb.calls["agent"]
    assert agent_call == {"sweep_id": "fake-sweep-id", "count": 2}

    assert len(seen_configs) == 2
    for cfg in seen_configs:  # lowercase names reached the real keys
        assert cfg["TRAINING_LEARNING_RATE"] == 0.001
        assert cfg["TRAINING_BATCH_SIZE"] == 4
    assert best["trials"] == 2
    assert best["best_metric"] == 0.5
    # Per-trial metrics were logged to wandb inside the run context.
    assert fake_wandb.calls["log"] == [{"val_loss": 0.5}] * 2
    # And mirrored to the local JSONL results file.
    results = (tmp_path / "sweep_results.jsonl").read_text().strip()
    assert len(results.splitlines()) == 2


def test_sweep_local_agent_without_wandb(monkeypatch, tmp_path):
    """Without wandb the local agent samples the same space."""
    import yaml

    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    from neurovit_tpu.training.sweep import run_sweep

    sweep_path = tmp_path / "sweep.yaml"
    sweep_path.write_text(yaml.safe_dump({
        "metric": {"name": "val_loss", "goal": "minimize"},
        "parameters": {"learning_rate": {"min": 1e-4, "max": 1e-2}},
    }))
    losses = iter([0.9, 0.4, 0.7])

    def train_fn(config):
        assert 1e-4 <= config["TRAINING_LEARNING_RATE"] <= 1e-2
        return {"val_loss": next(losses)}

    base = dict(BASE_KEYS, WANDB_ENABLED=True,
                GLOBAL_OUTPUT_DIR=str(tmp_path))
    best = run_sweep(base, train_fn, str(sweep_path), count=3)
    assert best["trials"] == 3
    assert best["best_metric"] == 0.4
