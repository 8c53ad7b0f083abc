"""NIfTI-1 codec: roundtrip, gz, lazy timepoint slicing."""

import numpy as np

from neurovit_tpu.data import nifti


def test_roundtrip_3d(tmp_path):
    vol = np.random.RandomState(0).randn(9, 11, 7).astype(np.float32)
    path = str(tmp_path / "vol.nii")
    nifti.save(path, vol)
    img = nifti.load(path)
    assert img.shape == (9, 11, 7)
    np.testing.assert_allclose(np.asarray(img.dataobj), vol, atol=1e-6)


def test_roundtrip_gz(tmp_path):
    vol = np.random.RandomState(1).randn(5, 6, 7, 4).astype(np.float32)
    path = str(tmp_path / "vol.nii.gz")
    nifti.save(path, vol)
    img = nifti.load(path)
    np.testing.assert_allclose(img.get_fdata(np.float32), vol, atol=1e-6)


def test_lazy_timepoint_slice(tmp_path):
    """The ADNI access pattern: crop + single-timepoint slice via dataobj
    (reference DatasetADNI.py:211-212) without reading the whole series."""
    series = np.random.RandomState(2).randn(12, 20, 12, 6).astype(np.float32)
    path = str(tmp_path / "series.nii")
    nifti.save(path, series)
    img = nifti.load(path)
    assert isinstance(img.dataobj, np.memmap)
    sl = np.asarray(img.dataobj[1:, 10:-9, 1:, 3])
    np.testing.assert_allclose(sl, series[1:, 10:-9, 1:, 3], atol=1e-6)


def test_fortran_order_matches_nibabel_convention(tmp_path):
    """Data must be stored column-major (x fastest), the NIfTI standard."""
    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "order.nii")
    nifti.save(path, vol)
    raw = open(path, "rb").read()
    data = np.frombuffer(raw[352:], dtype=np.float32)
    np.testing.assert_array_equal(data[:2], vol[:, 0, 0])
