"""Mesh-shape scaling sweep for the flagship train step (ROADMAP item 3).

Times the REAL Trainer step (jitted, donated, sharded — the production
code path, including GPipe when a pipe axis is requested) across a list of
(data, model, pipe) mesh shapes on whatever devices are visible, and
prints one JSON line per shape. On a real multi-chip pod this produces
the DP/TP/PP scaling curve; on this box it runs against the virtual CPU
mesh (JAX_PLATFORMS=cpu + --host-devices N) to validate the harness and
catch sharding regressions — the CPU numbers are NOT throughput evidence.

Usage:
  # virtual 8-device plumbing check (tiny shapes)
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/scaling_bench.py \
      --host-devices 8 --tiny
  # real pod, flagship shapes
  python scripts/scaling_bench.py --shapes dp8 dp4tp2 dp2tp2pp2 --batch 128
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, ".")


def parse_shape(spec: str):
    """'dp4tp2pp2' -> {'data': 4, 'model': 2, 'pipe': 2} (absent axes = 1)."""
    out = {"data": -1, "model": 1, "pipe": 1}
    for key, axis in (("dp", "data"), ("tp", "model"), ("pp", "pipe")):
        m = re.search(rf"{key}(\d+)", spec)
        if m:
            out[axis] = int(m.group(1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+", default=["dp-1"],
                    help="mesh specs like dp8 dp4tp2 dp2tp2pp2 "
                         "(dp-1 = all devices data-parallel)")
    ap.add_argument("--batch", type=int, default=128,
                    help="GLOBAL batch (split over the data axis)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="20^3 volumes / 2-block model (CPU plumbing check)")
    ap.add_argument("--host-devices", type=int, default=0,
                    help="force N virtual host devices (CPU validation)")
    args = ap.parse_args()

    if args.host_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}")

    import jax

    from neurovit_tpu.config import load_config
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", file=sys.stderr)

    size = dict(TRAINING_VIT_INPUT_SIZE=20, TRAINING_VIT_PATCH_SIZE=5,
                GRADCAM_CUBE_SIZE=8, MODEL_VIT_DIM=64, MODEL_VIT_DEPTH=2,
                MODEL_VIT_HEADS=4, MODEL_VIT_DIM_HEAD=16,
                MODEL_VIT_MLP_DIM=128) if args.tiny else \
        dict(TRAINING_VIT_INPUT_SIZE=90, TRAINING_VIT_PATCH_SIZE=9,
             GRADCAM_CUBE_SIZE=8)

    for spec in args.shapes:
        axes = parse_shape(spec)
        config = load_config(overrides=dict(
            size, DATASET_NAME="gradcam", DATASET_GENERATE=True,
            GRADCAM_NUM_SAMPLES=max(4 * args.batch, 64),
            GRADCAM_TRAIN_PATH=None, GRADCAM_VAL_PATH=None,
            TRAINING_BATCH_SIZE=args.batch, TRAINING_DROPOUT=0.1,
            TRAINING_PRECISION="f32" if args.tiny else "bf16",
            KERNEL_IMPL="xla" if args.tiny else "auto",
            MESH_DATA_AXIS=axes["data"], MESH_MODEL_AXIS=axes["model"],
            MESH_PIPE_AXIS=axes["pipe"], WANDB_MODE="disabled"))
        from neurovit_tpu.parallel import shard_batch

        ds_train, ds_val = get_datasets(config)
        trainer = Trainer(config, NeuroEncoder(config), ds_train, ds_val)
        host = trainer._device_batch(next(iter(trainer.dataloader)))[0]
        # Shard over the data axis exactly like the training loop — an
        # unsharded host batch would be replicated under jit, silently
        # timing redundant compute instead of data parallelism.
        batch = shard_batch(host, trainer.mesh)

        def step():
            trainer.train_state, metrics = trainer._train_step(
                trainer.train_state, batch)
            return float(metrics["loss"])        # hard sync (CLAUDE.md)

        step()                                   # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            loss = step()
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "mesh": {k: int(v) for k, v in trainer.mesh.shape.items()},
            "global_batch": args.batch,
            "step_ms": round(dt * 1e3, 2),
            "volumes_per_sec": round(args.batch / dt, 1),
            "loss": round(loss, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
