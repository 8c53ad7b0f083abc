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
