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


def test_reads_legacy_pre16_format(tmp_path):
    """Pre-1.6 pickle-stream checkpoints (the format old ADNI .pth files in
    the wild can carry) read back tensor-exact, torch.save as the oracle."""
    model = torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.LayerNorm(16), torch.nn.Linear(16, 2))
    path = str(tmp_path / "legacy.pth")
    torch.save(model.state_dict(), path, _use_new_zipfile_serialization=False)
    import zipfile
    assert not zipfile.is_zipfile(path)            # actually the old format

    ours = load_torch_state_dict(path)
    theirs = model.state_dict()
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(ours[k], theirs[k].numpy(), atol=0)

    # the state_dict.load front door routes the legacy stream too
    via_sd = sd.load(path)
    assert set(via_sd) == set(theirs)
    np.testing.assert_allclose(via_sd["0.weight"],
                               theirs["0.weight"].numpy(), atol=0)


def test_legacy_dtypes_and_noncontiguous(tmp_path):
    t = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    state = {
        "f32": t,
        "transposed": t.t(),                       # non-contiguous strides
        "f64": t.double(),
        "i64": torch.arange(5),
        "bf16": t.to(torch.bfloat16),
        "u8": torch.arange(7, dtype=torch.uint8),
    }
    path = str(tmp_path / "legacy_mix.pth")
    torch.save(state, path, _use_new_zipfile_serialization=False)
    ours = load_torch_state_dict(path)
    for k, v in state.items():
        np.testing.assert_allclose(ours[k], v.float().numpy(), atol=0,
                                   err_msg=k)


def test_legacy_rejects_arbitrary_objects(tmp_path):
    import pathlib
    import pickle
    path = str(tmp_path / "evil_legacy.pth")
    torch.save({"c": pathlib.PurePosixPath("x")}, path,
               _use_new_zipfile_serialization=False)
    with pytest.raises(pickle.UnpicklingError):
        load_torch_state_dict(path)


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


class _Evil:
    """Module-level so pickle.dump can serialize it (test payload)."""
    executed = False

    def __reduce__(self):
        return (setattr, (_Evil, "executed", True))


def test_state_dict_load_never_reaches_unrestricted_pickle(tmp_path):
    """sd.load on a non-zip, non-torch file (the numpy-pickle fallback)
    must refuse arbitrary pickled callables instead of executing them —
    a 'wild' checkpoint is untrusted input (advisor r4 finding)."""
    import pickle

    path = str(tmp_path / "evil_plain.pkl")
    with open(path, "wb") as f:
        pickle.dump({"w": _Evil()}, f)
    with pytest.raises(pickle.UnpicklingError):
        sd.load(path)
    assert not _Evil.executed

    # The legitimate fallback payload (flat numpy dict incl. scalars)
    # still loads through the restricted numpy unpickler.
    ok = str(tmp_path / "ok_plain.pkl")
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    with open(ok, "wb") as f:
        pickle.dump({"a": arr, "s": np.float32(1.5)}, f)
    out = sd.load(ok)
    np.testing.assert_array_equal(out["a"], arr)
    assert out["s"] == np.float32(1.5)


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


# ---------------------------------------------------------------------------
# Writer (save_torch_state_dict): torch.load is the oracle
# ---------------------------------------------------------------------------

def test_writer_loads_under_torch(tmp_path):
    import ml_dtypes
    from neurovit_tpu.training.torch_pth import save_torch_state_dict
    rng = np.random.default_rng(0)
    state = {
        "w": rng.standard_normal((4, 3, 2)).astype(np.float32),
        "b64": rng.standard_normal(5).astype(np.float64),
        "steps": np.int64(42),                     # 0-d (num_batches_tracked)
        "h": rng.standard_normal((3, 3)).astype(np.float16),
        "bf": rng.standard_normal((2, 5)).astype(ml_dtypes.bfloat16),
    }
    path = str(tmp_path / "ours.pth")
    save_torch_state_dict(path, state)

    # default weights_only=True (torch >= 2.6) must accept our pickle
    loaded = torch.load(path)
    assert set(loaded) == set(state)
    assert loaded["bf"].dtype == torch.bfloat16
    assert loaded["steps"].shape == ()
    for k, v in state.items():
        got = loaded[k].float().numpy() if k == "bf" else loaded[k].numpy()
        want = np.asarray(v, np.float32) if k == "bf" else np.asarray(v)
        np.testing.assert_array_equal(got, want, err_msg=k)
    torch.load(path, weights_only=False)           # legacy mode too


def test_writer_roundtrip_own_reader(tmp_path):
    from neurovit_tpu.training.torch_pth import save_torch_state_dict
    rng = np.random.default_rng(1)
    state = {"a": rng.standard_normal((7, 9)).astype(np.float32),
             "s": np.float32(1.25)}
    path = str(tmp_path / "rt.pth")
    save_torch_state_dict(path, state)
    back = load_torch_state_dict(path)
    for k, v in state.items():
        np.testing.assert_array_equal(back[k], np.asarray(v), err_msg=k)


def test_writer_into_torch_module(tmp_path):
    """A state dict exported here loads strict=True into the torch module
    it was shaped for — the migrate-back direction of checkpoint interop."""
    from neurovit_tpu.training.torch_pth import save_torch_state_dict
    model = torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.LayerNorm(16), torch.nn.Linear(16, 2))
    numpy_sd = {k: v.numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "export.pth")
    save_torch_state_dict(path, numpy_sd)
    model2 = torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.LayerNorm(16), torch.nn.Linear(16, 2))
    model2.load_state_dict(torch.load(path))       # strict by default
    x = torch.randn(3, 8)
    np.testing.assert_allclose(model2(x).detach().numpy(),
                               model(x).detach().numpy(), atol=1e-6)


def test_save_writes_torch_zip_and_legacy_pickle_still_loads(tmp_path):
    import pickle
    import zipfile
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    new = str(tmp_path / "new.pkl")
    sd.save(new, {"a": arr})
    assert zipfile.is_zipfile(new)                 # torch.load-able artifact
    np.testing.assert_array_equal(sd.load(new)["a"], arr)
    np.testing.assert_array_equal(torch.load(new)["a"].numpy(), arr)
    legacy = str(tmp_path / "legacy.pkl")
    with open(legacy, "wb") as f:
        pickle.dump({"a": arr}, f)
    np.testing.assert_array_equal(sd.load(legacy)["a"], arr)


def test_export_roundtrip_into_torch_reference_model(tiny_config, tmp_path):
    """The migrate-BACK path: a model trained here -> .state_dict.pkl
    (torch-zip) -> torch.load -> reference-style torch module, with forward
    parity. This is what lets reference tooling (its CAM scripts'
    torch.load) consume checkpoints produced by this framework."""
    import jax
    import jax.numpy as jnp
    from neurovit_tpu.models import NeuroEncoder
    from torch_ref import TorchViT3D

    config = dict(tiny_config, MODEL_VIT_DEPTH=2)
    model = NeuroEncoder(config)
    params = model.init(jax.random.key(7))["params"]
    path = str(tmp_path / "export.state_dict.pkl")
    sd.save(path, sd.to_state_dict(model, params, None))

    loaded = torch.load(path)                      # reference-side load
    # Invert the mirror's ref_state_dict key scheme: drop the encoder
    # prefix; mirror ``layers`` == reference ``transformer.layers``.
    prefix = "volume_encoder.vit3d."
    stripped = {}
    for k, v in loaded.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        if k.startswith("transformer.layers."):
            k = k[len("transformer."):]
        stripped[k] = v
    tmodel = TorchViT3D(
        image_size=20, image_patch_size=5, frames=20, frame_patch_size=5,
        num_classes=8, dim=64, depth=2, heads=4, dim_head=16, mlp_dim=128,
        channels=1).eval()
    tmodel.load_state_dict(stripped, strict=True)

    vol = np.random.RandomState(2).randn(2, 20, 20, 20).astype(np.float32)
    ours, _ = model.apply(params, jnp.asarray(vol))
    tin = torch.from_numpy(vol).permute(0, 3, 1, 2).unsqueeze(1)
    with torch.no_grad():
        theirs = tmodel(tin).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)
