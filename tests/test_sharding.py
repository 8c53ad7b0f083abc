"""Multi-device sharding on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from neurovit_tpu.parallel import create_mesh, shard_batch, param_shardings
from neurovit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    from neurovit_tpu.parallel.mesh import PIPE_AXIS
    mesh = create_mesh({"MESH_DATA_AXIS": -1, "MESH_MODEL_AXIS": 1})
    assert dict(mesh.shape) == {DATA_AXIS: 8, MODEL_AXIS: 1, PIPE_AXIS: 1}
    mesh2 = create_mesh({"MESH_DATA_AXIS": -1, "MESH_MODEL_AXIS": 2})
    assert dict(mesh2.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2, PIPE_AXIS: 1}
    mesh3 = create_mesh({"MESH_DATA_AXIS": -1, "MESH_PIPE_AXIS": 2})
    assert dict(mesh3.shape) == {DATA_AXIS: 4, MODEL_AXIS: 1, PIPE_AXIS: 2}
    with pytest.raises(ValueError):
        create_mesh({"MESH_DATA_AXIS": 5, "MESH_MODEL_AXIS": 3})


def test_batch_sharded_over_data_axis():
    mesh = create_mesh()
    batch = {"volume": np.zeros((16, 4, 4, 4), np.float32),
             "label": np.zeros((16,), np.int32),
             "subject": ["s"] * 16}
    out = shard_batch(batch, mesh)
    assert len(out["volume"].sharding.device_set) == 8
    assert out["volume"].addressable_shards[0].data.shape[0] == 2
    assert out["subject"] == ["s"] * 16  # metadata passes through


def test_data_parallel_train_step(tiny_config):
    """Full jitted train step with batch sharded over 8 devices."""
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_BATCH_SIZE": 16, "DATASET_GENERATE": True,
                   "GRADCAM_NUM_SAMPLES": 64})
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    trainer = Trainer(config, model, ds_train, ds_val)
    batch = shard_batch(trainer._device_batch(next(iter(trainer.dataloader)))[0],
                        trainer.mesh)
    ts, metrics = trainer._train_step(trainer.train_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["count"]) == 16


def test_dp_step_matches_single_device(tiny_config):
    """A train step on the 8-device DP mesh must produce the SAME loss and
    post-update params as the identical step on a 1-device mesh — wrong
    collectives would pass a finite-loss check but fail this. Doubles as the
    scoped-mesh regression: two Trainers with different meshes coexist in one
    process (the mesh is a context around the jitted calls, not global)."""
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_BATCH_SIZE": 16, "DATASET_GENERATE": True,
                   "GRADCAM_NUM_SAMPLES": 64})
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)
    mesh8 = create_mesh(config)
    mesh1 = create_mesh(config, devices=jax.devices()[:1])
    t8 = Trainer(config, model, ds_train, ds_val, mesh=mesh8)
    t1 = Trainer(config, model, ds_train, ds_val, mesh=mesh1)

    host = t8._device_batch(next(iter(t8.dataloader)))[0]
    ts8, m8 = t8._train_step(t8.train_state, shard_batch(host, mesh8))
    ts1, m1 = t1._train_step(t1.train_state, shard_batch(host, mesh1))

    # Same global batch, same init (same seed): losses differ only by
    # cross-device reduction order.
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    assert float(m8["count"]) == float(m1["count"]) == 16
    for a, b in zip(jax.tree.leaves(ts8["params"]),
                    jax.tree.leaves(ts1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_4d_volume_stream_sharded(tiny_config):
    """4D mode: the folded B*T stream shards over the data axis even when
    B < n_devices (batch arrives replicated)."""
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_BATCH_SIZE": 2, "TRAINING_EPOCHS": 1})
    model = NeuroEncoder(config)
    import test_trainer_4d
    ds = test_trainer_4d.Synthetic4D(4, t=4)   # B*T = 8 divides 8 devices
    trainer = Trainer(config, model, ds, test_trainer_4d.Synthetic4D(2, t=4))
    batch = shard_batch(trainer._device_batch(next(iter(trainer.dataloader)))[0],
                        trainer.mesh, replicate=True)
    assert batch["volume"].shape[0] == 2          # no B padding in 4D
    trainer.train_state, metrics = trainer._train_step(
        trainer.train_state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_4d_tp_step_matches_single_device(tiny_config):
    """4D mode on a dp4 x tp2 mesh (frozen ViT encoder tensor-parallel over
    the model axis, B*T stream over the data axis): one train step must
    match the 1-device step — loss and updated params within reduction-order
    tolerance. This is the §2.0-item-5 scaling story for the 4D path: the
    frozen encoder forward dominates the step, so TP over it is the lever."""
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import Trainer

    config = dict(tiny_config)
    config.update({"TRAINING_DIM": 4, "DATASET_NAME": "adni",
                   "TRAINING_BATCH_SIZE": 2, "TRAINING_EPOCHS": 1,
                   "MESH_DATA_AXIS": 4, "MESH_MODEL_AXIS": 2})
    model = NeuroEncoder(config)
    import test_trainer_4d
    ds = test_trainer_4d.Synthetic4D(4, t=4)
    ds_val = test_trainer_4d.Synthetic4D(2, t=4)
    mesh_tp = create_mesh(config)
    mesh_1 = create_mesh({"MESH_DATA_AXIS": 1, "MESH_MODEL_AXIS": 1},
                         devices=jax.devices()[:1])
    t_tp = Trainer(config, model, ds, ds_val, mesh=mesh_tp)
    t_1 = Trainer(config, model, ds, ds_val, mesh=mesh_1)
    from neurovit_tpu.parallel.mesh import PIPE_AXIS
    assert dict(mesh_tp.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2, PIPE_AXIS: 1}

    host = t_tp._device_batch(next(iter(t_tp.dataloader)))[0]
    ts_tp, m_tp = t_tp._train_step(
        t_tp.train_state, shard_batch(host, mesh_tp, replicate=True))
    ts_1, m_1 = t_1._train_step(
        t_1.train_state, shard_batch(host, mesh_1, replicate=True))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts_tp["params"]),
                    jax.tree.leaves(ts_1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_tensor_parallel_shardings(tiny_config):
    """TP rules split qkv/mlp weights over the model axis."""
    from neurovit_tpu.models import NeuroEncoder

    mesh = create_mesh({"MESH_DATA_AXIS": -1, "MESH_MODEL_AXIS": 2})
    model = NeuroEncoder(tiny_config)
    params = model.init(jax.random.key(0))["params"]
    shardings = param_shardings(params, mesh)
    qkv = shardings["volume_encoder"]["blocks"]["qkv"]["kernel"]
    assert qkv.spec[-1] == MODEL_AXIS
    fc2 = shardings["volume_encoder"]["blocks"]["fc2"]["kernel"]
    assert fc2.spec[-2] == MODEL_AXIS
    norm = shardings["volume_encoder"]["blocks"]["attn_norm"]["scale"]
    assert norm.spec == ()

    # Forward must produce identical results under TP sharding.
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 20, 20),
                    jnp.float32)
    logits_rep, _ = model.apply(params, x)
    sharded = jax.tree.map(jax.device_put, params, shardings)
    logits_tp = jax.jit(lambda p, v: model.apply(p, v)[0])(sharded, x)
    # TP changes matmul reduction order/partial-sum precision; allow a
    # correspondingly looser tolerance.
    np.testing.assert_allclose(np.asarray(logits_rep), np.asarray(logits_tp),
                               rtol=2e-3, atol=2e-3)


def test_local_rows_orders_shards_by_batch_index():
    """distributed.local_rows reassembles a batch-sharded array's
    addressable shards in batch order (the multi-host eval path; on one
    host it must equal np.asarray of the whole array)."""
    import numpy as np
    from neurovit_tpu.parallel import create_mesh
    from neurovit_tpu.parallel.distributed import global_batch, local_rows

    mesh = create_mesh({"MESH_DATA_AXIS": -1})
    x = np.arange(mesh.size * 3 * 2, dtype=np.float32).reshape(
        mesh.size * 3, 2)
    arr = global_batch(x, mesh)
    np.testing.assert_array_equal(local_rows(arr), x)
