"""Entry point: train / sweep / inference over the NeuroViT-TPU framework.

CLI-compatible rebuild of the reference's ``main.py``:
``python main.py [name] [--cuda N] [--wandb bool] [--inference] [--sweep]``
plus ``--config`` to select config4D.yaml etc. (the reference requires
editing config.yaml in place, README.md:88-91).
"""

import os
import warnings

import jax
import numpy as np

from neurovit_tpu.config import get_config, parse_args
from neurovit_tpu.data import get_datasets
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import MetricLogger, Trainer
from neurovit_tpu.training import checkpoint as ckpt


def set_seeds(config):
    """Seed numpy (host-side shuffles); JAX keys derive from TRAINING_SEED
    inside the Trainer (reference seeds torch+numpy, main.py:86-88)."""
    np.random.seed(config["TRAINING_SEED"])


def build(config):
    set_seeds(config)
    dataset_train, dataset_val = get_datasets(config)
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(config["TRAINING_SEED"]))
    if model.is_4d:
        # Bootstrap the frozen volume encoder from the best 3D checkpoint
        # (reference NeuroEncoder.py:25-32).
        best = os.path.join(config["GLOBAL_BASE_PATH"],
                            config["BEST_MODEL_PATH"])
        if os.path.exists(best):
            variables["params"] = ckpt.load_pretrained_volume_encoder(
                model, variables["params"], best)
            print(f"Loaded frozen volume encoder from {best}")
        else:
            print(f"WARNING: BEST_MODEL_PATH {best} not found; "
                  f"4D volume encoder starts from random init")
    return dataset_train, dataset_val, model, variables


def main():
    warnings.simplefilter(action="ignore", category=FutureWarning)
    args = parse_args()
    config = get_config(args)

    # Multi-host pods: bring up the JAX coordination service before any
    # backend use (no-op on single-host runs; parallel/distributed.py).
    # MUST precede compile_cache.maybe_enable — that call touches
    # jax.default_backend(), which initializes the backends and makes a
    # later jax.distributed.initialize() raise.
    from neurovit_tpu.parallel import distributed
    if distributed.maybe_initialize(config):
        print(f"Distributed runtime: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices")

    # Persistent XLA compilation cache: restarts of an unchanged program
    # skip the ~20-40 s TPU compile (utils/compile_cache.py).
    from neurovit_tpu.utils import compile_cache
    if compile_cache.maybe_enable(config):
        print(f"Compilation cache: {config['GLOBAL_COMPILE_CACHE']}")

    if not config["INFERENCE"] and not config["SWEEP"]:
        print("Training mode enabled.")
        folds = config.get("FOLDS", 0)
        if folds:
            # k-fold CV over generate_folds indexes (the reference's
            # commented-out fold loop, main.py:127-131, made functional).
            folds_dir = config.get("DATASET_FOLDS_DIR", "./src/data")
            for fold in range(1, folds + 1):
                print(f"FOLD {fold}/{folds} training...")
                fold_config = dict(config)
                train_pkl = os.path.join(folds_dir, f"fold_{fold}",
                                         "train_data.pkl")
                val_pkl = os.path.join(folds_dir, f"fold_{fold}",
                                       "val_data.pkl")
                for key in ("ADNI_TRAIN_PATH", "PAIN_TRAIN_PKL_PATH"):
                    fold_config[key] = train_pkl
                for key in ("ADNI_VAL_PATH", "PAIN_VAL_PKL_PATH"):
                    fold_config[key] = val_pkl
                ds_train, ds_val, model, variables = build(fold_config)
                trainer = Trainer(fold_config, model, ds_train, ds_val,
                                  variables=variables)
                trainer.run()
                print(f"FOLD {fold}/{folds} completed.")
                print("=" * 50)
            return
        logger = MetricLogger(config)
        dataset_train, dataset_val, model, variables = build(config)
        trainer = Trainer(config, model, dataset_train, dataset_val,
                          variables=variables, logger=logger)
        if config.get("RESUME"):
            # True mid-run resume (params + optimizer + epoch + RNG +
            # plateau-scheduler counters) — the reference's bare state_dict
            # saves cannot do this (SURVEY §5.4).
            trainer.restore(config["RESUME"])
            print(f"Resumed from {config['RESUME']} "
                  f"at epoch {int(trainer.train_state['epoch'])}")
        trainer.run()
        logger.finish()

    elif config["SWEEP"]:
        print("Sweep mode enabled.")
        from neurovit_tpu.training.sweep import run_sweep

        def train_fn(sweep_config):
            ds_train, ds_val, model, variables = build(sweep_config)
            trainer = Trainer(sweep_config, model, ds_train, ds_val,
                              variables=variables)
            trainer.run()
            return {"val_loss": trainer.val_loss}

        sweep_path = os.path.join(config["GLOBAL_BASE_PATH"],
                                  "configs/sweep.yaml")
        # 50 trials matches the reference's wandb.agent count (main.py:157).
        best = run_sweep(config, train_fn, sweep_path,
                         count=config.get("SWEEP_COUNT", 50))
        print(f"Sweep finished: best={best}")

    else:
        print("Training is disabled. Inference only.")
        dataset_train, dataset_val, model, variables = build(config)
        best = os.path.join(config["GLOBAL_BASE_PATH"],
                            config["BEST_MODEL_PATH"])
        variables = ckpt.load_variables_file(model, variables, best,
                                             strict=False)
        trainer = Trainer(config, model, dataset_train, dataset_val,
                          variables=variables)
        trainer.evaluate_samples()


if __name__ == "__main__":
    main()
