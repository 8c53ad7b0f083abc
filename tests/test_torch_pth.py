"""Torch-free .pth reader vs real torch.save files (torch as oracle)."""

import numpy as np
import pytest
import torch

from neurovit_tpu.training import state_dict as sd
from neurovit_tpu.training.torch_pth import load_torch_state_dict


def test_reads_real_torch_save(tmp_path):
    model = torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.LayerNorm(16), torch.nn.Linear(16, 2))
    path = str(tmp_path / "model.pth")
    torch.save(model.state_dict(), path)

    ours = load_torch_state_dict(path)
    theirs = model.state_dict()
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(ours[k], theirs[k].numpy(), atol=0)


def test_dtypes_and_noncontiguous(tmp_path):
    t = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    state = {
        "f32": t,
        "transposed": t.t(),                       # non-contiguous strides
        "f64": t.double(),
        "i64": torch.arange(5),
        "bf16": t.to(torch.bfloat16),
        "scalarish": torch.tensor([3.5]),
    }
    path = str(tmp_path / "mix.pth")
    torch.save(state, path)
    ours = load_torch_state_dict(path)
    for k, v in state.items():
        np.testing.assert_allclose(ours[k], v.float().numpy(), atol=0,
                                   err_msg=k)


def test_rejects_arbitrary_objects(tmp_path):
    path = str(tmp_path / "evil.pth")
    torch.save({"w": torch.ones(2), "obj": {"nested": [1, 2]}}, path)
    # plain containers are fine
    out = load_torch_state_dict(path)
    assert out["obj"]["nested"] == [1, 2]

    # An importable non-tensor object pickles fine via torch.save but must
    # be refused by the restricted unpickler.
    import pathlib
    import pickle
    path2 = str(tmp_path / "evil2.pth")
    torch.save({"c": pathlib.PurePosixPath("x")}, path2)
    with pytest.raises(pickle.UnpicklingError):
        load_torch_state_dict(path2)


def test_reference_checkpoint_roundtrip_into_model(tiny_config, tmp_path):
    """Full migration path: torch reference-style checkpoint -> our model."""
    import jax
    from neurovit_tpu.models import NeuroEncoder
    from torch_ref import TorchViT3D

    torch.manual_seed(0)
    tmodel = TorchViT3D(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=8, dim=64, depth=2, heads=4, dim_head=16, mlp_dim=128,
        channels=1).eval()
    # reference-style keys, saved with real torch.save
    ref_sd = {k: torch.from_numpy(np.asarray(v).copy())
              for k, v in tmodel.ref_state_dict().items()}
    path = str(tmp_path / "reference.pth")
    torch.save(ref_sd, path)

    config = dict(tiny_config, MODEL_VIT_DEPTH=2)
    model = NeuroEncoder(config)
    params = model.init(jax.random.key(0))["params"]
    params = sd.load_into(model, params, sd.load(path), strict=True)

    vol = np.random.RandomState(1).randn(2, 20, 20, 20).astype(np.float32)
    import jax.numpy as jnp
    ours, _ = model.apply(params, jnp.asarray(vol))
    tin = torch.from_numpy(vol).permute(0, 3, 1, 2).unsqueeze(1)
    with torch.no_grad():
        theirs = tmodel(tin).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)
