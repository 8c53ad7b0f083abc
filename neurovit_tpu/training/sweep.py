"""Hyperparameter sweeps over the wandb sweep.yaml grammar.

The reference drives ``wandb.sweep``/``wandb.agent`` with
``configs/sweep.yaml`` (``main.py:149-157``) — but its lowercase parameter
names never reach the UPPERCASE config keys, so every sweep run silently
trains with base hyperparameters (SURVEY §2.1.5). Here:

- parameters are mapped onto the real config keys
  (``config.apply_sweep_overrides``),
- with wandb installed, the same wandb.agent flow is used,
- without wandb (this environment), a local agent samples the identical
  search space: ``values`` uniformly, ``min/max`` ranges log-uniformly
  (wandb's default for positive ranges), tracking the best ``metric.name``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

import numpy as np
import yaml

from neurovit_tpu.config import apply_sweep_overrides


def sample_params(space: Dict[str, Any], rng: np.random.RandomState
                  ) -> Dict[str, Any]:
    out = {}
    for name, spec in space.items():
        if "value" in spec:
            out[name] = spec["value"]
        elif "values" in spec:
            out[name] = spec["values"][rng.randint(len(spec["values"]))]
        elif "min" in spec and "max" in spec:
            lo, hi = float(spec["min"]), float(spec["max"])
            if lo > 0 and hi > 0:     # log-uniform for positive ranges
                out[name] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
            else:
                out[name] = float(rng.uniform(lo, hi))
        else:
            raise ValueError(f"Unsupported sweep spec for {name}: {spec}")
    return out


def _wandb_if_enabled(config: Dict[str, Any]):
    """The wandb module when installed AND WANDB_ENABLED, else None."""
    if not config.get("WANDB_ENABLED", False):
        return None
    try:
        import wandb  # type: ignore
        return wandb
    except ImportError:
        return None


def _run_wandb_agent(wandb, base_config, train_fn, sweep_cfg, count,
                     metric_name, sign, log):
    """The reference's wandb.sweep + wandb.agent flow (main.py:149-157).

    Each agent trial mirrors the reference's ``train_sweep``
    (``main.py:65-84``): wandb.init gives the sampled params in
    ``wandb.config``; they overwrite the base config — but through
    ``apply_sweep_overrides`` so lowercase sweep names reach the real
    UPPERCASE keys (quirk §2.1.5 fix).
    """
    best = {"best_params": None, "best_metric": None, "trials": 0}

    def trial_fn():
        with wandb.init() as _run:
            params = dict(wandb.config)
            config = apply_sweep_overrides(base_config, params)
            metrics = train_fn(config)
            wandb.log(metrics)
        value = float(metrics[metric_name])
        log.write(json.dumps({"trial": best["trials"], "params": params,
                              "metrics": metrics}) + "\n")
        log.flush()
        best["trials"] += 1
        if (best["best_metric"] is None
                or sign * value < sign * best["best_metric"]):
            best["best_metric"] = value
            best["best_params"] = params

    sweep_id = wandb.sweep(sweep_cfg, project="NeuroViT_Sweep")
    wandb.agent(sweep_id, function=trial_fn, count=count)
    return best


def run_sweep(base_config: Dict[str, Any],
              train_fn: Callable[[Dict[str, Any]], Dict[str, float]],
              sweep_config_path: str, count: int = 50) -> Dict[str, Any]:
    """Run `count` sweep trials; returns {"best_params", "best_metric", ...}.

    ``train_fn(config) -> metrics`` must return the sweep metric
    (e.g. {"val_loss": ...}).
    """
    with open(sweep_config_path) as f:
        sweep_cfg = yaml.safe_load(f)
    space = sweep_cfg["parameters"]
    metric_name = sweep_cfg.get("metric", {}).get("name", "val_loss")
    goal = sweep_cfg.get("metric", {}).get("goal", "minimize")
    sign = 1.0 if goal == "minimize" else -1.0

    rng = np.random.RandomState(base_config.get("TRAINING_SEED", 42))
    out_dir = base_config.get("GLOBAL_OUTPUT_DIR", "./results/runs")
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, "sweep_results.jsonl")

    wandb = _wandb_if_enabled(base_config)
    if wandb is not None:
        with open(log_path, "a") as log:
            return _run_wandb_agent(wandb, base_config, train_fn, sweep_cfg,
                                    count, metric_name, sign, log)

    best = {"best_params": None, "best_metric": None, "trials": 0}
    with open(log_path, "a") as log:
        for trial in range(count):
            params = sample_params(space, rng)
            config = apply_sweep_overrides(base_config, params)
            print(f"[sweep] trial {trial + 1}/{count}: {params}")
            metrics = train_fn(config)
            value = float(metrics[metric_name])
            log.write(json.dumps({"trial": trial, "params": params,
                                  "metrics": metrics}) + "\n")
            log.flush()
            best["trials"] = trial + 1
            if (best["best_metric"] is None
                    or sign * value < sign * best["best_metric"]):
                best["best_metric"] = value
                best["best_params"] = params
                print(f"[sweep] new best {metric_name}={value:.5f}")
    return best
