"""z-major volume pipeline: zero-transpose host path, device-side layout fix.

Datasets read cropped timepoints into z-major memory ([Z, Y, X] C-order,
x-contiguous like the NIfTI file) exposed as [X, Y, Z] transpose views;
the loader stacks the raw buffers (memcpy) and the trainer ships them to the
device raw, transposing inside jit (trainer._model_volume). These tests pin
the value-equivalence of that whole path against the plain C-order route.
"""

import numpy as np
import pandas as pd
import pytest

from neurovit_tpu.data import get_datasets, nifti
from neurovit_tpu.data.loader import DataLoader, stack_volumes, zyx_base
from neurovit_tpu.models import NeuroEncoder
from neurovit_tpu.parallel import shard_batch
from neurovit_tpu.training import Trainer


def test_stack_volumes_zero_copy_and_values():
    rng = np.random.RandomState(0)
    raws = [np.ascontiguousarray(rng.randn(7, 6, 5).astype(np.float32))
            for _ in range(4)]
    views = [r.transpose(2, 1, 0) for r in raws]          # [X, Y, Z] views
    out, zyx = stack_volumes(views)
    assert zyx
    assert out.shape == (4, 5, 6, 7)
    # Zero-copy: the result is itself a transpose view of a C-contig buffer.
    assert not out.flags.c_contiguous
    assert out.transpose(0, 3, 2, 1).flags.c_contiguous
    np.testing.assert_array_equal(out, np.stack(views))

    # Mixed/plain inputs take the plain np.stack path.
    plain = [np.ascontiguousarray(v) for v in views]
    out2, zyx2 = stack_volumes(plain)
    assert not zyx2
    assert out2.flags.c_contiguous
    np.testing.assert_array_equal(out2, out)
    assert zyx_base(plain[0]) is None


def _adni_corpus(tmp_path):
    rng = np.random.RandomState(0)
    rows = []
    ages = [60, 61, 62, 63, 85, 86, 87, 88]
    for i, age in enumerate(ages):
        path = str(tmp_path / f"sub{i}.nii")
        series = rng.randn(21, 39, 21, 2).astype(np.float32)
        nifti.save(path, series)
        rows.append({"ID": i, "Subject": f"S{i:03d}", "Group": "CN",
                     "Sex": "F", "Age": age,
                     "Path_sMRI_brain": path, "Path_fMRI_brain": path})
    csv_path = str(tmp_path / "manifest.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path


def _adni_config(tiny_config, tmp_path, csv_path, **over):
    config = dict(tiny_config)
    config.update({
        "DATASET_NAME": "adni", "DATASET_TASK": "age",
        "DATASET_GENERATE": True, "DATASET_SPLIT_RATIO": 0.75,
        "ADNI_CSV_PATH": csv_path,
        "ADNI_TRAIN_PATH": str(tmp_path / "adni_train.pkl"),
        "ADNI_VAL_PATH": str(tmp_path / "adni_val.pkl"),
        "TRAINING_BATCH_SIZE": 4, "TRAINING_EPOCHS": 1,
    })
    config.update(over)
    return config


def test_adni_batches_are_zyx_views(tiny_config, tmp_path):
    csv_path = _adni_corpus(tmp_path)
    np.random.seed(0)
    ds_train, _ = get_datasets(_adni_config(tiny_config, tmp_path, csv_path))
    loader = DataLoader(ds_train, 4, num_workers=2, seed=0)
    batch = next(iter(loader))
    vol = batch["volume"]
    assert vol.shape[1:] == (20, 20, 20)
    assert vol.transpose(0, 3, 2, 1).flags.c_contiguous   # z-major memory
    # Values match a direct reference read of the same samples.
    for j in range(vol.shape[0]):
        _, t, path, *_ = ds_train.data[j]
        img = nifti.load(path)
        box = np.asarray(img.dataobj[1:, 10:-9, 1:, t], np.float32)
        expect = (box - box.mean()) / (box.std() + 1e-8)
        np.testing.assert_allclose(np.asarray(vol[j]), expect, atol=1e-5)


def test_train_step_zyx_matches_plain(tiny_config, tmp_path):
    """One jitted train step on the raw z-major buffer (zyx=True) must match
    the same step on the host-transposed C-order batch (zyx=False)."""
    csv_path = _adni_corpus(tmp_path)
    np.random.seed(0)
    config = _adni_config(tiny_config, tmp_path, csv_path,
                          TRAINING_DROPOUT=0.0)
    ds_train, ds_val = get_datasets(config)
    model = NeuroEncoder(config)

    np.random.seed(0)
    t1 = Trainer(config, model, ds_train, ds_val)
    np.random.seed(0)
    t2 = Trainer(config, model, ds_train, ds_val)

    batch = next(iter(t1.dataloader))
    host, zyx = t1._device_batch(batch)
    assert zyx, "ADNI loader batch should take the z-major fast path"
    plain = dict(host, volume=np.ascontiguousarray(
        host["volume"].transpose(0, 3, 2, 1)))           # [B, X, Y, Z]

    ts1, m1 = t1._train_step(t1.train_state,
                             shard_batch(host, t1.mesh), True)
    ts2, m2 = t2._train_step(t2.train_state,
                             shard_batch(plain, t2.mesh), False)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-6)
    l1 = jax_leaf_checksum(ts1["params"])
    l2 = jax_leaf_checksum(ts2["params"])
    assert l1 == pytest.approx(l2, rel=1e-6)


def test_zyx_flag_is_the_decision(tiny_config, tmp_path):
    """The trainer follows the loader's explicit zyx flag, not array-flag
    sniffing; a layout-changing upstream copy that contradicts the flag is a
    hard error (tripwire), never silently-transposed inputs."""
    csv_path = _adni_corpus(tmp_path)
    np.random.seed(0)
    config = _adni_config(tiny_config, tmp_path, csv_path)
    ds_train, ds_val = get_datasets(config)
    trainer = Trainer(config, NeuroEncoder(config), ds_train, ds_val)

    batch = next(iter(trainer.dataloader))
    assert batch["zyx"]

    # Flag cleared upstream -> the (already z-major-viewed) volume is shipped
    # via np.asarray: correct values, just a host-side transpose cost.
    host_plain, zyx_plain = trainer._device_batch(dict(batch, zyx=False))
    assert not zyx_plain
    host_fast, zyx_fast = trainer._device_batch(batch)
    assert zyx_fast
    np.testing.assert_array_equal(
        host_plain["volume"], host_fast["volume"].transpose(0, 3, 2, 1))

    # A contiguity-changing transform (copy to C-order) without updating the
    # flag would feed transposed volumes to the model -> tripwire fires.
    copied = dict(batch, volume=np.ascontiguousarray(batch["volume"]))
    with pytest.raises(AssertionError, match="zyx"):
        trainer._device_batch(copied)


def jax_leaf_checksum(params):
    import jax
    return float(sum(np.abs(np.asarray(x, np.float64)).sum()
                     for x in jax.tree.leaves(params)))
