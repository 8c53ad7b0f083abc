"""Native C++ NIfTI reader vs the Python codec (bit-level equivalence)."""

import numpy as np
import pytest

from neurovit_tpu.data import native_io, nifti
from neurovit_tpu.data.transforms import zscore

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native library not built")


@pytest.fixture
def series(tmp_path):
    data = np.random.RandomState(0).randn(13, 29, 13, 5).astype(np.float32)
    path = str(tmp_path / "series.nii")
    nifti.save(path, data)
    return path, data


def test_single_timepoint_matches_python(series):
    path, data = series
    out = native_io.read_timepoint(path, 3, ((1, 0), (10, -9), (1, 0)),
                                   (12, 10, 12), zscore=False)
    golden = data[1:, 10:-9, 1:, 3]
    np.testing.assert_allclose(out, golden, atol=1e-6)


def test_zscore_matches_python(series):
    path, data = series
    out = native_io.read_timepoint(path, 0, ((1, 0), (10, -9), (1, 0)),
                                   (12, 10, 12), zscore=True)
    golden = zscore(data[1:, 10:-9, 1:, 0])
    np.testing.assert_allclose(out, golden, atol=1e-5)


def test_batch_read(series):
    path, data = series
    out = native_io.read_batch([path] * 4, [0, 1, 2, 3],
                               ((1, 0), (10, -9), (1, 0)), (12, 10, 12),
                               zscore=False, n_threads=3)
    assert out.shape == (4, 12, 10, 12)
    for t in range(4):
        np.testing.assert_allclose(out[t], data[1:, 10:-9, 1:, t], atol=1e-6)


def test_error_paths(series, tmp_path):
    path, _ = series
    assert native_io.read_timepoint(path, 99, ((1, 0), (10, -9), (1, 0)),
                                    (12, 10, 12)) is None   # bad timepoint
    missing = str(tmp_path / "missing.nii")
    assert native_io.read_timepoint(missing, 0, ((1, 0), (10, -9), (1, 0)),
                                    (12, 10, 12)) is None
    assert not native_io.usable_for("/some/file.nii.gz")


def test_adni_dataset_uses_native(series, tmp_path):
    """ADNI sample() via native reader == python fallback."""
    import pickle
    path, data = series
    samples = [("S0", 2, path, "CN", "F", 60)]
    pkl = str(tmp_path / "idx.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(samples, f)
    from neurovit_tpu.data.adni import ADNIDataset
    config = {"ADNI_CSV_PATH": "", "ADNI_TRAIN_PATH": pkl,
              "ADNI_VAL_PATH": pkl, "DATASET_SPLIT_RATIO": 0.85,
              "DATASET_TASK": "age", "DATASET_TRANSFORMS": False,
              "TRAINING_VIT_INPUT_SIZE": 12, "TRAINING_SEED": 0,
              "DATA_NATIVE_IO": True}
    ds = ADNIDataset(config, mode="train")
    s = ds.sample(0)
    golden = zscore(data[1:, 10:-9, 1:, 2])
    np.testing.assert_allclose(s["volume"], golden, atol=1e-5)
