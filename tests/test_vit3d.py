"""3D ViT: shapes, patchify ordering, and full-forward parity vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from einops import rearrange

from neurovit_tpu.models import vit3d
from neurovit_tpu.models.neuro_encoder import NeuroEncoder
from neurovit_tpu.training import state_dict as sd

from torch_ref import TorchViT3D

CFG = vit3d.ViTConfig(
    image_size=16, image_patch_size=4, frames=16, frame_patch_size=4,
    num_classes=8, dim=64, depth=3, heads=4, dim_head=16, mlp_dim=128,
    channels=1, pool="cls")


def test_patchify_matches_einops():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 16, 16, 16).astype(np.float32)
    ours = np.asarray(vit3d.patchify(jnp.asarray(x), CFG))
    theirs = rearrange(torch.from_numpy(x),
                       "b c (f pf) (h p1) (w p2) -> b (f h w) (p1 p2 pf c)",
                       pf=4, p1=4, p2=4).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_forward_shapes():
    params = vit3d.init(jax.random.key(0), CFG)
    x = jnp.zeros((2, 1, 16, 16, 16))
    logits, probe = vit3d.apply(params, x, CFG)
    assert logits.shape == (2, 8)
    assert probe is None  # no probe_shift -> no Grad-CAM probe tax
    shift = jnp.zeros((2, CFG.num_patches + 1, CFG.dim))
    logits_probed, probe = vit3d.apply(params, x, CFG, probe_shift=shift)
    assert probe.shape == (2, CFG.num_patches + 1, CFG.dim)
    np.testing.assert_allclose(np.asarray(logits_probed), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)


def _tiny_model_config():
    from neurovit_tpu.config import load_config
    return load_config(overrides={
        "TRAINING_VIT_INPUT_SIZE": 16, "TRAINING_VIT_PATCH_SIZE": 4,
        "GRADCAM_CUBE_SIZE": 8, "DATASET_NAME": "gradcam",
        "MODEL_VIT_DIM": 64, "MODEL_VIT_DEPTH": 3, "MODEL_VIT_HEADS": 4,
        "MODEL_VIT_DIM_HEAD": 16, "MODEL_VIT_MLP_DIM": 128,
        "TRAINING_DROPOUT": 0.0, "TRAINING_PRECISION": "f32",
        "KERNEL_IMPL": "xla",
    })


def test_full_forward_parity_with_torch():
    """Copy torch weights into our pytree via the state-dict mapping and
    compare logits on identical input — the core numerics gate."""
    torch.manual_seed(0)
    tmodel = TorchViT3D(
        image_size=16, image_patch_size=4, frames=16, frame_patch_size=4,
        num_classes=8, dim=64, depth=3, heads=4, dim_head=16, mlp_dim=128,
        channels=1, pool="cls").eval()

    model = NeuroEncoder(_tiny_model_config())
    variables = model.init(jax.random.key(0))
    params = sd.load_into(model, variables["params"], tmodel.ref_state_dict(),
                          strict=True)

    rng = np.random.RandomState(3)
    vol = rng.randn(2, 16, 16, 16).astype(np.float32)   # [B, H, W, D]
    ours, _ = model.apply(params, jnp.asarray(vol))

    # ViT3DEncoder.forward: [B,H,W,D] -> [B,D,H,W] -> add channel.
    tin = torch.from_numpy(vol).permute(0, 3, 1, 2).unsqueeze(1)
    theirs = tmodel(tin).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_state_dict_roundtrip():
    model = NeuroEncoder(_tiny_model_config())
    variables = model.init(jax.random.key(1))
    exported = sd.to_state_dict(model, variables["params"])
    reimported = sd.load_into(model, model.init(jax.random.key(2))["params"],
                              exported, strict=True)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(reimported)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mean_pool_variant():
    cfg = vit3d.ViTConfig(
        image_size=16, image_patch_size=4, frames=16, frame_patch_size=4,
        num_classes=8, dim=64, depth=1, heads=4, dim_head=16, mlp_dim=128,
        channels=1, pool="mean")
    params = vit3d.init(jax.random.key(0), cfg)
    logits, _ = vit3d.apply(params, jnp.zeros((1, 1, 16, 16, 16)), cfg)
    assert logits.shape == (1, 8)
