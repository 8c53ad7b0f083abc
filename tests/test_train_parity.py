"""Training-step parity vs torch: same weights + batches -> same dynamics.

The strongest accuracy-parity proxy available without real ADNI/Pain data
(BASELINE.md's val-accuracy table): run K AdamW steps of the reference
training loop (src/Trainer.py:65-76 semantics — CrossEntropyLoss,
torch.optim.AdamW(lr, weight_decay), fp32, dropout 0) in torch and in the
rebuild from identical weights and identical batches, and assert the
per-step losses and the post-training parameters track each other.
"""

import pytest

import jax
import numpy as np
import torch

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.parallel import create_mesh, shard_batch
from neurovit_tpu.training import Trainer
from neurovit_tpu.training import state_dict as sd

from torch_ref import TorchViT3D

pytestmark = pytest.mark.slow  # e2e tier; -m 'not slow' skips

LR, WD, STEPS, BATCH = 1e-3, 0.01, 5, 8


class _Dummy3D:
    """Minimal dataset so Trainer can build its loaders; the parity batches
    themselves are fed to _train_step directly."""

    def __len__(self):
        return BATCH

    def sample(self, idx):
        rng = np.random.RandomState(idx)
        return {"volume": rng.randn(20, 20, 20).astype(np.float32),
                "label": idx % 8, "subject": f"s{idx}", "timepoint": 0}


def _batches(num_classes):
    rng = np.random.RandomState(7)
    out = []
    for _ in range(STEPS):
        out.append({
            "volume": rng.randn(BATCH, 20, 20, 20).astype(np.float32),
            "label": rng.randint(0, num_classes, size=BATCH).astype(np.int32),
            "valid": np.ones(BATCH, np.bool_),
        })
    return out


def test_adamw_training_dynamics_match_torch(tiny_config):
    config = dict(tiny_config)
    config.update({
        "TRAINING_LEARNING_RATE": LR,
        "TRAINING_WEIGHT_DECAY": WD,
        "TRAINING_ACCUMULATION_STEP": 1,
        "TRAINING_LR_SCHEDULE": "constant",
        "TRAINING_BATCH_SIZE": BATCH,
    })

    # ---- torch reference loop -------------------------------------------
    torch.manual_seed(0)
    tmodel = TorchViT3D(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=8, dim=64, depth=2, heads=4, dim_head=16, mlp_dim=128,
        channels=1, pool="cls")
    tmodel.train()
    # Snapshot the INITIAL weights before the torch loop mutates them.
    init_state_dict = {k: v.copy() for k, v in tmodel.ref_state_dict().items()}
    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)
    loss_fn = torch.nn.CrossEntropyLoss()

    batches = _batches(num_classes=8)
    torch_losses = []
    for b in batches:
        opt.zero_grad()
        tin = torch.from_numpy(b["volume"]).permute(0, 3, 1, 2).unsqueeze(1)
        logits = tmodel(tin)
        loss = loss_fn(logits, torch.from_numpy(b["label"]).long())
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- rebuild: same weights, same batches ----------------------------
    model = NeuroEncoder(config)
    mesh = create_mesh(config, devices=jax.devices()[:1])
    trainer = Trainer(config, model, _Dummy3D(), _Dummy3D(), mesh=mesh)
    params = sd.load_into(model, jax.tree.map(np.asarray,
                                              trainer.train_state["params"]),
                          init_state_dict, strict=True)
    # Fresh optimizer state for the torch-initialized params (AdamW moments
    # are zero-initialized in both frameworks).
    trainer.train_state["params"] = trainer._replicate(params)
    trainer.train_state["opt_state"] = trainer._replicate(
        trainer.tx.init(trainer.train_state["params"]))

    jax_losses = []
    for b in batches:
        device_batch = shard_batch(trainer._device_batch(b)[0], mesh)
        trainer.train_state, metrics = trainer._train_step(
            trainer.train_state, device_batch)
        jax_losses.append(float(metrics["loss"]))

    # Per-step losses: fp32, no dropout -> only matmul-order noise, but it
    # compounds through 5 optimizer steps.
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-4)

    # Post-training parameter drift: export back through the same key
    # mapping and compare leaf-for-leaf against torch's updated weights.
    ours = sd.to_state_dict(model, trainer.train_state["params"])
    theirs = tmodel.ref_state_dict(prefix="")
    ours = {k.replace("volume_encoder.vit3d.", ""): v for k, v in ours.items()}
    assert set(ours) == set(theirs)
    for key in sorted(theirs):
        np.testing.assert_allclose(
            ours[key], theirs[key], rtol=1e-3, atol=2e-5,
            err_msg=f"parameter {key} diverged after {STEPS} AdamW steps")
