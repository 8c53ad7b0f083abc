"""Pipeline parallelism (GPipe over the `pipe` mesh axis) on the 8-device
virtual CPU mesh.

The reference is single-GPU (SURVEY §5.8) so there is no behavior to match;
these pin the pipeline's NUMERICS to the unpipelined program: same forward,
same gradients, same post-update params — a wrong schedule or collective
would produce finite-but-different values, which is exactly what the
single-device comparisons catch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurovit_tpu.parallel import create_mesh, shard_batch, pipeline_blocks
from neurovit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


def _toy_blocks(depth, dim, key):
    ks = jax.random.split(key, depth)
    return {
        "w": jnp.stack([jax.random.normal(k, (dim, dim)) * 0.3 for k in ks]),
        "b": jnp.stack([jax.random.normal(k, (dim,)) * 0.1 for k in ks]),
    }


def _toy_block_fn(block, h, rng, micro_idx=0):
    del rng, micro_idx
    return h + jnp.tanh(h @ block["w"] + block["b"])


def _plain_scan(blocks, rngs, x):
    def body(c, xs):
        bp, br = xs
        return _toy_block_fn(bp, c, br), None
    out, _ = jax.lax.scan(body, x, (blocks, rngs))
    return out


def test_pipeline_blocks_matches_scan():
    """pp4 x dp2, 8 blocks (2 per stage), forward AND gradients match the
    plain scan to float rounding."""
    mesh = create_mesh({"MESH_DATA_AXIS": 2, "MESH_PIPE_AXIS": 4})
    depth, dim = 8, 16
    blocks = _toy_blocks(depth, dim, jax.random.key(0))
    rngs = jnp.zeros((depth, 2), jnp.uint32)
    x = jax.random.normal(jax.random.key(1), (8, 6, dim))
    g = jax.random.normal(jax.random.key(2), x.shape)

    def pipelined(b, v):
        return pipeline_blocks(_toy_block_fn, b, rngs, v, n_stages=4)

    with jax.set_mesh(mesh):
        y_ref = _plain_scan(blocks, rngs, x)
        y_pp = jax.jit(pipelined)(blocks, x)
        np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)

        gb_ref = jax.grad(lambda b: jnp.vdot(_plain_scan(b, rngs, x), g))(blocks)
        gb_pp = jax.jit(jax.grad(
            lambda b: jnp.vdot(pipelined(b, x), g)))(blocks)
        for a, c in zip(jax.tree.leaves(gb_ref), jax.tree.leaves(gb_pp)):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)
        gx_ref = jax.grad(lambda v: jnp.vdot(_plain_scan(blocks, rngs, v), g))(x)
        gx_pp = jax.jit(jax.grad(
            lambda v: jnp.vdot(pipelined(blocks, v), g)))(x)
        np.testing.assert_allclose(np.asarray(gx_pp), np.asarray(gx_ref),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_micro_idx_distinct_per_microbatch():
    """Each microbatch reaches block_fn with its own micro_idx (the dropout
    decorrelation hook): a block that adds micro_idx must produce
    x_m + depth * m for microbatch m."""
    mesh = create_mesh({"MESH_DATA_AXIS": 2, "MESH_PIPE_AXIS": 4})
    depth, dim = 4, 8
    blocks = {"z": jnp.zeros((depth, 1))}
    rngs = jnp.zeros((depth, 2), jnp.uint32)
    x = jax.random.normal(jax.random.key(0), (8, 4, dim))

    def add_micro(block, h, rng, micro_idx):
        del block, rng
        return h + micro_idx.astype(h.dtype)

    with jax.set_mesh(mesh):
        out = jax.jit(lambda v: pipeline_blocks(
            add_micro, blocks, rngs, v, n_stages=4, n_micro=4))(x)
    xm = x.reshape(4, 2, 4, dim)
    om = np.asarray(out).reshape(4, 2, 4, dim)
    for m in range(4):
        np.testing.assert_allclose(om[m], np.asarray(xm[m]) + depth * m,
                                   rtol=1e-6)


def test_pp_rejects_non_vit_encoder(tiny_config):
    """pipe>1 with the ResNet encoder is a configuration error (no pipeline
    path — it would silently replicate work over the pipe axis)."""
    from neurovit_tpu.models import NeuroEncoder
    config = dict(tiny_config)
    config.update({"MODEL_VOLUME_ENCODER": "resnet", "MESH_PIPE_AXIS": 2})
    with pytest.raises(ValueError, match="pipeline"):
        NeuroEncoder(config)


def test_pipeline_validation_errors():
    mesh = create_mesh({"MESH_DATA_AXIS": 2, "MESH_PIPE_AXIS": 4})
    blocks = _toy_blocks(6, 8, jax.random.key(0))   # 6 % 4 != 0
    rngs = jnp.zeros((6, 2), jnp.uint32)
    x = jnp.zeros((8, 4, 8))
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_blocks(_toy_block_fn, blocks, rngs, x, n_stages=4)
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_blocks(_toy_block_fn,
                            _toy_blocks(8, 8, jax.random.key(0)),
                            jnp.zeros((8, 2), jnp.uint32),
                            jnp.zeros((7, 4, 8)), n_stages=4, n_micro=4)


def test_pp_train_step_matches_single_device(tiny_config):
    """Full ViT train step on a dp4 x pp2 mesh vs the 1-device step: same
    loss, same post-update params. Covers the sharding.param_shardings PIPE
    rule (stacked block params placed stage-local) and the vit3d pipelined
    apply path end-to-end through the Trainer."""
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_BATCH_SIZE": 16, "DATASET_GENERATE": True,
                   "GRADCAM_NUM_SAMPLES": 64,
                   "MESH_DATA_AXIS": 4, "MESH_PIPE_AXIS": 2})
    ds_train, ds_val = get_datasets(config)
    model_pp = NeuroEncoder(config)
    assert model_pp.vit_cfg.pipeline_stages == 2

    config_1 = dict(config)
    config_1.update({"MESH_DATA_AXIS": 1, "MESH_PIPE_AXIS": 1})
    model_1 = NeuroEncoder(config_1)

    mesh_pp = create_mesh(config)
    assert dict(mesh_pp.shape) == {DATA_AXIS: 4, MODEL_AXIS: 1, PIPE_AXIS: 2}
    mesh_1 = create_mesh(config_1, devices=jax.devices()[:1])
    t_pp = Trainer(config, model_pp, ds_train, ds_val, mesh=mesh_pp)
    t_1 = Trainer(config_1, model_1, ds_train, ds_val, mesh=mesh_1)

    # Stacked block params are stage-local (sharded over pipe on axis 0),
    # and their Adam moments shard with them (replicated moments would
    # forfeit pipelining's memory split).
    qkv = t_pp.train_state["params"]["volume_encoder"]["blocks"]["qkv"]["kernel"]
    assert qkv.sharding.spec[0] == PIPE_AXIS
    # chain[0] Masked -> InjectHyperparams -> adamw chain[0] ScaleByAdam
    adam = t_pp.train_state["opt_state"][0].inner_state.inner_state[0]
    mu_qkv = adam.mu["volume_encoder"]["blocks"]["qkv"]["kernel"]
    assert mu_qkv.sharding.spec[0] == PIPE_AXIS

    host = t_pp._device_batch(next(iter(t_pp.dataloader)))[0]
    ts_pp, m_pp = t_pp._train_step(t_pp.train_state,
                                   shard_batch(host, mesh_pp))
    ts_1, m_1 = t_1._train_step(t_1.train_state, shard_batch(host, mesh_1))

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    assert float(m_pp["count"]) == float(m_1["count"]) == 16
    for a, b in zip(jax.tree.leaves(ts_pp["params"]),
                    jax.tree.leaves(ts_1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_dp_tp_pp_composed_matches_single_device(tiny_config):
    """All three parallelism modes composed on one mesh (dp2 x tp2 x pp2):
    Megatron TP stays under the auto partitioner INSIDE the manual-pipe
    shard_map region (axis_names={'pipe'}), so the three compose without
    hand-written cross-mode collectives. One train step must match the
    1-device step."""
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_BATCH_SIZE": 16, "DATASET_GENERATE": True,
                   "GRADCAM_NUM_SAMPLES": 64, "MESH_DATA_AXIS": 2,
                   "MESH_MODEL_AXIS": 2, "MESH_PIPE_AXIS": 2})
    ds_train, ds_val = get_datasets(config)
    model_3 = NeuroEncoder(config)
    config_1 = dict(config)
    config_1.update({"MESH_DATA_AXIS": 1, "MESH_MODEL_AXIS": 1,
                     "MESH_PIPE_AXIS": 1})
    model_1 = NeuroEncoder(config_1)

    mesh_3 = create_mesh(config)
    assert dict(mesh_3.shape) == {DATA_AXIS: 2, MODEL_AXIS: 2, PIPE_AXIS: 2}
    mesh_1 = create_mesh(config_1, devices=jax.devices()[:1])
    t_3 = Trainer(config, model_3, ds_train, ds_val, mesh=mesh_3)
    t_1 = Trainer(config_1, model_1, ds_train, ds_val, mesh=mesh_1)

    host = t_3._device_batch(next(iter(t_3.dataloader)))[0]
    ts_3, m_3 = t_3._train_step(t_3.train_state, shard_batch(host, mesh_3))
    ts_1, m_1 = t_1._train_step(t_1.train_state, shard_batch(host, mesh_1))
    np.testing.assert_allclose(float(m_3["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts_3["params"]),
                    jax.tree.leaves(ts_1["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=1e-5)


def test_pp_serving_matches_unsharded(tiny_config, tmp_path):
    """Predictor on a dp4 x pp2 mesh returns the same probabilities as the
    plain single-device Predictor (same checkpoint)."""
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.serving import Predictor
    from neurovit_tpu.training import state_dict as sd

    config = dict(tiny_config)
    model_1 = NeuroEncoder(config)
    variables = model_1.init(jax.random.key(0))
    path = str(tmp_path / "model.pkl")
    sd.save(path, sd.to_state_dict(model_1, variables["params"]))

    config_pp = dict(config)
    config_pp.update({"MESH_DATA_AXIS": 4, "MESH_PIPE_AXIS": 2})
    mesh = create_mesh(config_pp)
    p_pp = Predictor.from_checkpoint(config_pp, path, batch_size=8, mesh=mesh)
    p_1 = Predictor.from_checkpoint(config, path, batch_size=8)

    vols = np.random.RandomState(0).randn(8, 20, 20, 20).astype(np.float32)
    labels_pp, probs_pp = p_pp(vols)
    labels_1, probs_1 = p_1(vols)
    np.testing.assert_allclose(probs_pp, probs_1, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(labels_pp, labels_1)


def test_pp_4d_step_matches_single_device(tiny_config):
    """4D mode (frozen pipelined volume encoder + temporal head) on a
    dp4 x pp2 mesh matches the 1-device step."""
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_BATCH_SIZE": 2, "TRAINING_EPOCHS": 1,
                   "MESH_DATA_AXIS": 4, "MESH_PIPE_AXIS": 2})
    model_pp = NeuroEncoder(config)
    config_1 = dict(config)
    config_1.update({"MESH_DATA_AXIS": 1, "MESH_PIPE_AXIS": 1})
    model_1 = NeuroEncoder(config_1)

    import test_trainer_4d
    ds = test_trainer_4d.Synthetic4D(4, t=4)
    ds_val = test_trainer_4d.Synthetic4D(2, t=4)
    mesh_pp = create_mesh(config)
    mesh_1 = create_mesh(config_1, devices=jax.devices()[:1])
    t_pp = Trainer(config, model_pp, ds, ds_val, mesh=mesh_pp)
    t_1 = Trainer(config_1, model_1, ds, ds_val, mesh=mesh_1)

    host = t_pp._device_batch(next(iter(t_pp.dataloader)))[0]
    ts_pp, m_pp = t_pp._train_step(
        t_pp.train_state, shard_batch(host, mesh_pp, replicate=True))
    ts_1, m_1 = t_1._train_step(
        t_1.train_state, shard_batch(host, mesh_1, replicate=True))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts_pp["params"]),
                    jax.tree.leaves(ts_1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_pp_gradcam_probe_falls_back(tiny_config):
    """With pipeline configured, the Grad-CAM probe path still works (it
    falls back to the unpipelined composition, which tolerates any mesh)."""
    from neurovit_tpu.models import NeuroEncoder

    config = dict(tiny_config)
    config.update({"MESH_DATA_AXIS": 4, "MESH_PIPE_AXIS": 2})
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(0))
    mesh = create_mesh(config)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 20, 20), jnp.float32)
    with jax.set_mesh(mesh):
        from neurovit_tpu.explainability.gradcam_vit3d import get_attention_map
        cam, class_idx = get_attention_map(model, variables, x, threshold=20.0)
    assert cam.shape == (2, 20, 20, 20)
    assert np.isfinite(np.asarray(cam)).all()
    assert class_idx.shape == (2,)
