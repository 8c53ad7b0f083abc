"""Predictor: checkpoint load, fixed-batch compile, remainder handling."""

import jax
import numpy as np

from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.serving import Predictor
from neurovit_tpu.training import state_dict as sd


def test_predictor_from_checkpoint_and_remainders(tiny_config, tmp_path):
    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(0))
    path = str(tmp_path / "model.pkl")
    sd.save(path, sd.to_state_dict(model, variables["params"]))

    predictor = Predictor.from_checkpoint(tiny_config, path, batch_size=4)
    vols = np.random.RandomState(0).randn(7, 20, 20, 20).astype(np.float32)
    labels, probs = predictor(vols)
    assert labels.shape == (7,)
    assert probs.shape == (7, model.num_classes)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)

    # Padding of the remainder must not change results vs single calls.
    labels1, probs1 = predictor(vols[:1])
    np.testing.assert_allclose(probs1[0], probs[0], atol=1e-5)

    # Checkpoint weights actually loaded (different init -> same outputs
    # as the saved model's direct forward).
    import jax.numpy as jnp
    direct, _ = model.apply(variables["params"], jnp.asarray(vols[:2]))
    direct_probs = np.asarray(jax.nn.softmax(direct, axis=-1))
    np.testing.assert_allclose(probs[:2], direct_probs, atol=1e-4)


def test_predictor_mesh_parallel_matches_single_device(tiny_config, tmp_path):
    """DP-sharded serving over the 8-device mesh: same probabilities as the
    single-device predictor, batch sharded over the data axis."""
    from neurovit_tpu.parallel import create_mesh
    from neurovit_tpu.training import state_dict as sd

    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(3))
    path = str(tmp_path / "model.pkl")
    sd.save(path, sd.to_state_dict(model, variables["params"]))

    mesh = create_mesh()
    p_mesh = Predictor.from_checkpoint(tiny_config, path, batch_size=8,
                                       mesh=mesh)
    p_one = Predictor.from_checkpoint(tiny_config, path, batch_size=8)
    vols = np.random.RandomState(1).randn(11, 20, 20, 20).astype(np.float32)
    labels_m, probs_m = p_mesh(vols)
    labels_1, probs_1 = p_one(vols)
    np.testing.assert_allclose(probs_m, probs_1, atol=1e-5)
    np.testing.assert_array_equal(labels_m, labels_1)

    import pytest
    with pytest.raises(ValueError):
        Predictor.from_checkpoint(tiny_config, path, batch_size=6, mesh=mesh)


def test_predictor_host_bf16_transfer_equality(tiny_config, tmp_path):
    """host_transfer_dtype='bf16' is bit-exact under bf16 compute (the
    model's first device op is the same f32->bf16 RNE cast the host
    applies), and refused under f32 compute."""
    import pytest
    config = dict(tiny_config)
    config["TRAINING_PRECISION"] = "bf16"
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(5))
    path = str(tmp_path / "model.pkl")
    sd.save(path, sd.to_state_dict(model, variables["params"]))

    p_f32 = Predictor.from_checkpoint(config, path, batch_size=4)
    p_bf16 = Predictor.from_checkpoint(config, path, batch_size=4,
                                       host_transfer_dtype="bf16")
    vols = np.random.RandomState(2).randn(6, 20, 20, 20).astype(np.float32)
    labels_a, probs_a = p_f32(vols)
    labels_b, probs_b = p_bf16(vols)
    np.testing.assert_array_equal(probs_a, probs_b)   # identical bits
    np.testing.assert_array_equal(labels_a, labels_b)

    with pytest.raises(ValueError, match="TRAINING_PRECISION"):
        Predictor.from_checkpoint(tiny_config, path,
                                  host_transfer_dtype="bf16")


def test_predictor_4d(tiny_config, tmp_path):
    """Serving the 4D model ([N, H, W, D, T] sequences)."""
    from neurovit_tpu.training import state_dict as sd

    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_DROPOUT": 0.0})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(7))
    path = str(tmp_path / "model4d.pkl")
    sd.save(path, sd.to_state_dict(model, variables["params"]))

    predictor = Predictor.from_checkpoint(config, path, batch_size=2, seed=7)
    vols = np.random.RandomState(2).randn(3, 20, 20, 20, 4).astype(np.float32)
    labels, probs = predictor(vols)
    assert labels.shape == (3,)
    assert probs.shape == (3, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)


def test_serving_cli_predicts_nifti_files(tiny_config, tmp_path):
    """python -m neurovit_tpu.serving over a dir of .nii files: one CSV row
    per (file, timepoint), probabilities summing to 1."""
    import csv
    import yaml

    from neurovit_tpu.data import nifti
    from neurovit_tpu.serving import main as serving_main

    model = NeuroEncoder(tiny_config)
    variables = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "best.pkl")
    sd.save(ckpt, sd.to_state_dict(model, variables["params"]))

    vols = tmp_path / "vols"
    vols.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        # (21, 39, 21, T): the ADNI crop [1:, 10:-9, 1:] yields 20^3.
        nifti.save(str(vols / f"v{i}.nii"),
                   rng.randn(21, 39, 21, 2).astype(np.float32))

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump({k: v for k, v in tiny_config.items()
                   if not k.startswith("_")}, f)
    out = str(tmp_path / "preds.csv")
    serving_main([str(vols), "--config", cfg_path, "--checkpoint", ckpt,
                  "--output", out, "--batch-size", "4"])

    with open(out) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    assert header[:3] == ["path", "timepoint", "prediction"]
    assert len(body) == 4                     # 2 files x 2 timepoints
    n_classes = model.num_classes
    for row in body:
        probs = np.array([float(v) for v in row[3:3 + n_classes]])
        assert abs(probs.sum() - 1.0) < 1e-4
        assert int(row[2]) == int(np.argmax(probs))
