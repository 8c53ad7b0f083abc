"""4D end-to-end: Trainer over a synthetic 4D dataset with accumulation."""

import numpy as np

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import Trainer


class Synthetic4D:
    """Minimal 4D dataset: [H, W, D, T] series whose temporal-mean intensity
    encodes the label (learnable by the mean-pooled temporal head)."""

    def __init__(self, n, grid=20, t=3, seed=0):
        self.rng = np.random.RandomState(seed)
        self.n, self.grid, self.t = n, grid, t
        self.labels = self.rng.randint(0, 2, n)

    def __len__(self):
        return self.n

    def sample(self, idx):
        base = self.rng.randn(self.grid, self.grid, self.grid,
                              self.t).astype(np.float32)
        base += 2.0 * self.labels[idx]
        return {"volume": base, "label": int(self.labels[idx]),
                "subject": f"s{idx}", "timepoint": 0}


def test_4d_trainer_step_and_validate(tiny_config):
    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_BATCH_SIZE": 2, "TRAINING_ACCUMULATION_STEP": 2,
                   "TRAINING_EPOCHS": 1})
    model = NeuroEncoder(config)
    assert model.is_4d
    ds = Synthetic4D(8)
    trainer = Trainer(config, model, ds, Synthetic4D(4, seed=1))

    # One full epoch: accumulating train steps over [B,H,W,D,T] batches.
    trainer.train(0)
    trainer.validate(0)
    assert np.isfinite(trainer.val_loss)

    # The frozen volume encoder must be untouched by training.
    import jax
    fresh = model.init(jax.random.key(config["TRAINING_SEED"]))
    for a, b in zip(jax.tree.leaves(fresh["params"]["volume_encoder"]),
                    jax.tree.leaves(
                        trainer.train_state["params"]["volume_encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
