"""ResNet checkpoint interop: torch-key export/import incl. BN running stats.

Pain-ResNet is a published reference configuration (README.md:134) and the
reference CAM scripts load resnet checkpoints
(explainability/xAi_gradcam_Resnet3D/gradcam.py:27-30) — so resnet weights
must cross frameworks like the ViT's do (training/state_dict.py
_resnet_entries).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.training import state_dict as sd

from torch_ref import TorchResNet3D


def _resnet_model(tiny_config):
    config = dict(tiny_config, MODEL_VOLUME_ENCODER="resnet",
                  MODEL_RESNET_DEPTH=10, TRAINING_PRECISION="f32",
                  DATASET_NAME="adni", DATASET_TASK="age")
    return NeuroEncoder(config)


def _randomized_variables(model, seed=0):
    """Init + randomized BN running stats (so state round-trips are real)."""
    variables = model.init(jax.random.key(seed))
    rng = np.random.RandomState(seed)
    variables["state"] = jax.tree.map(
        lambda x: jnp.asarray(rng.rand(*np.shape(x)).astype(np.float32) + 0.5),
        variables["state"])
    return variables


def test_resnet_state_dict_round_trip(tiny_config):
    model = _resnet_model(tiny_config)
    variables = _randomized_variables(model)
    exported = sd.to_state_dict(model, variables["params"], variables["state"])
    # Reference key layout present, incl. running stats + step counter.
    assert "resnet_3d.resnet.conv1.weight" in exported
    assert "resnet_3d.resnet.layer2.0.downsample.1.running_var" in exported
    assert exported["resnet_3d.resnet.bn1.num_batches_tracked"].dtype \
        == np.int64

    fresh = model.init(jax.random.key(1))
    merged = sd.load_into_variables(model, fresh, exported, strict=True)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resnet_torch_import_forward_parity(tiny_config):
    """Copy a torch ResNet's weights (+ BN stats advanced by a train-mode
    forward) into our pytree and compare eval-mode logits."""
    torch.manual_seed(0)
    tmodel = TorchResNet3D(layers=(1, 1, 1, 1), n_classes=2,
                           n_input_channels=1)
    x = np.random.RandomState(0).randn(2, 1, 20, 20, 20).astype(np.float32)
    tmodel.train()
    tmodel(torch.from_numpy(x))            # advances running stats
    tmodel.eval()
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()

    model = _resnet_model(tiny_config)
    variables = sd.load_into_variables(
        model, model.init(jax.random.key(0)), tmodel.ref_state_dict(),
        strict=True)
    # NeuroEncoder input is [B, H, W, D]; encode_volume permutes to
    # [B, 1, D, H, W] == the torch NCDHW input above.
    vol = jnp.asarray(x[:, 0].transpose(0, 2, 3, 1))
    logits, _ = model.apply(variables["params"], vol,
                            state=variables["state"], deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), t_logits,
                               rtol=2e-3, atol=2e-3)


def test_resnet_checkpoint_saves_state_dict(tiny_config, tmp_path):
    """Trainer-style saves now include the .state_dict.pkl for resnet runs
    (previously orbax-only)."""
    from neurovit_tpu.training import checkpoint as ckpt
    model = _resnet_model(tiny_config)
    variables = _randomized_variables(model)
    path = str(tmp_path / "last.pkl")
    ckpt.save_last_model({"params": variables["params"],
                          "model_state": variables["state"]}, model, path)
    loaded = ckpt.load_variables_file(model, model.init(jax.random.key(2)),
                                      path, strict=True)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_only_load_skips_bn_stats_nonstrict(tiny_config):
    """load_into (params-only, e.g. the 4D volume-encoder bootstrap path)
    must not crash on resnet checkpoints: BN running-stat entries are
    skipped under strict=False and demand the variables form under
    strict=True."""
    import pytest

    model = _resnet_model(tiny_config)
    variables = _randomized_variables(model)
    exported = sd.to_state_dict(model, variables["params"],
                                variables["state"])
    fresh = model.init(jax.random.key(3))
    merged = sd.load_into(model, fresh["params"], exported, strict=False)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="load_into_variables"):
        sd.load_into(model, fresh["params"], exported, strict=True)


def test_resnet_export_roundtrip_into_torch_model(tiny_config, tmp_path):
    """Migrate-back: a ResNet state dict saved here (torch-zip format) loads
    via plain torch.load into the reference-style torch model strict=True,
    with eval-mode forward parity — the file the reference CAM scripts
    would consume (gradcam.py:27-30)."""
    model = _resnet_model(tiny_config)
    variables = _randomized_variables(model, seed=3)
    path = str(tmp_path / "resnet.state_dict.pkl")
    sd.save(path, sd.to_state_dict(model, variables["params"],
                                   variables["state"]))

    loaded = torch.load(path)
    prefix = "resnet_3d.resnet."
    stripped = {k[len(prefix):]: v for k, v in loaded.items()
                if k.startswith(prefix)}
    tmodel = TorchResNet3D(layers=(1, 1, 1, 1), n_classes=2,
                           n_input_channels=1)
    tmodel.load_state_dict(stripped, strict=True)
    tmodel.eval()

    x = np.random.RandomState(5).randn(2, 20, 20, 20).astype(np.float32)
    ours, _ = model.apply(variables["params"], jnp.asarray(x),
                          state=variables["state"])
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(x).permute(0, 3, 1, 2).unsqueeze(1)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)
