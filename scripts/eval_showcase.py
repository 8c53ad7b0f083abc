"""Evaluate a trained flagship showcase checkpoint against the val ceiling.

The showcase task (synthetic cube-position, reference DatasetGradCAM.py:
100-119) samples 1331 classes uniformly; with 3200 train draws ~9% of
classes never occur in training, so the best reachable val accuracy for
seed 42 is exactly 721/800 = 0.90125 (tests/test_gradcam.py::
test_val_label_coverage_ceiling_flagship pins the math). This script loads
a trained checkpoint and checks the sharper claim: the model is PERFECT on
every achievable sample — its error set is exactly the unseen-label set.

Usage (after the showcase run, on the chip):
    python -u scripts/eval_showcase.py --config /tmp/showcase/showcase.yaml \
        --checkpoint results/runs/<run>/model-e<N>.state_dict.pkl
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from neurovit_tpu.config import load_config
    from neurovit_tpu.data.synthetic import GradCAMDataset
    from neurovit_tpu.serving import Predictor

    config = load_config(args.config)
    train = GradCAMDataset(config, "train")
    val = GradCAMDataset(config, "val")
    seen = np.unique(train.labels)
    achievable = np.isin(val.labels, seen)

    predictor = Predictor.from_checkpoint(config, args.checkpoint,
                                          batch_size=args.batch)
    correct = np.zeros(len(val), dtype=bool)
    for start in range(0, len(val), args.batch):
        idx = range(start, min(start + args.batch, len(val)))
        volumes = np.stack([val.sample(i)["volume"] for i in idx])
        preds, _ = predictor(volumes)
        correct[list(idx)] = preds == val.labels[list(idx)]
        print(f"  eval {idx[-1] + 1}/{len(val)}", flush=True)

    acc = float(correct.mean())
    acc_seen = float(correct[achievable].mean())
    acc_unseen = float(correct[~achievable].mean()) if (~achievable).any() else 1.0
    # The sharp claim: every error has an unseen label <=> no achievable
    # sample is wrong.
    perfect_on_achievable = bool(correct[achievable].all())
    print(json.dumps({
        "val_accuracy": acc,
        "ceiling": float(achievable.mean()),
        "accuracy_on_seen_labels": acc_seen,
        "accuracy_on_unseen_labels": acc_unseen,
        "n_unseen_label_samples": int((~achievable).sum()),
        "perfect_on_achievable": perfect_on_achievable,
    }), flush=True)
    if not perfect_on_achievable:
        wrong_seen = np.flatnonzero(achievable & ~correct)
        print(f"achievable errors at val idx {wrong_seen[:20].tolist()}",
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
