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


def test_gz_readable_path_caches_and_memmaps(tmp_path, monkeypatch):
    """.nii.gz inflates once into the cache dir; later loads memmap the
    cached .nii (lazy slicing for gz series — the reference's Pain eager-read
    hot spot, DatasetPain.py:186-188, never comes back)."""
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(tmp_path / "cache"))
    series = np.random.RandomState(3).randn(6, 7, 8, 5).astype(np.float32)
    src = str(tmp_path / "series.nii.gz")
    nifti.save(src, series)

    cached = nifti.readable_path(src)
    assert cached.endswith(".nii") and not cached.endswith(".gz")
    assert nifti.readable_path(src) == cached            # stable key
    img = nifti.load(src)
    assert isinstance(img.dataobj, np.memmap)            # lazy via the cache
    np.testing.assert_allclose(np.asarray(img.dataobj[1:, 2:-1, 1:, 3]),
                               series[1:, 2:-1, 1:, 3], atol=1e-6)

    # A replaced source file gets a fresh cache entry (mtime/size key).
    series2 = series + 1.0
    nifti.save(src, series2)
    import os
    os.utime(src, ns=(os.stat(src).st_atime_ns,
                      os.stat(src).st_mtime_ns + 10_000_000))
    cached2 = nifti.readable_path(src)
    assert cached2 != cached
    np.testing.assert_allclose(
        np.asarray(nifti.load(src).dataobj[..., 0]), series2[..., 0],
        atol=1e-6)


def test_gz_cache_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv("NEUROVIT_GZ_CACHE", "0")
    vol = np.random.RandomState(4).randn(4, 5, 6).astype(np.float32)
    src = str(tmp_path / "v.nii.gz")
    nifti.save(src, vol)
    assert nifti.readable_path(src) == src               # passthrough
    img = nifti.load(src)                                # in-memory gunzip
    assert not isinstance(img.dataobj, np.memmap)
    np.testing.assert_allclose(np.asarray(img.dataobj), vol, atol=1e-6)


def test_adni_native_batch_reads_gz_via_cache(tmp_path, monkeypatch):
    """The native whole-batch fast path serves .nii.gz corpora through the
    decompressed cache (values identical to the .nii path)."""
    import pandas as pd

    from neurovit_tpu.data import native_io
    from neurovit_tpu.data.adni import ADNIDataset

    if not native_io.available():
        import pytest
        pytest.skip("native lib not built")
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(tmp_path / "cache"))
    rng = np.random.RandomState(5)
    samples = []
    for i in range(4):
        path = str(tmp_path / f"s{i}.nii.gz")
        nifti.save(path, rng.randn(21, 39, 21, 2).astype(np.float32))
        samples.append((f"S{i:03d}", i % 2, path, "CN", "F", 60 + i))
    import pickle
    pkl = str(tmp_path / "idx.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(samples, f)
    config = {"ADNI_CSV_PATH": "", "ADNI_TRAIN_PATH": pkl,
              "ADNI_VAL_PATH": pkl, "DATASET_TASK": "age",
              "DATASET_SPLIT_RATIO": 0.85,
              "DATASET_TRANSFORMS": False, "TRAINING_SEED": 0,
              "TRAINING_VIT_INPUT_SIZE": 20, "DATA_NATIVE_IO": True}
    ds = ADNIDataset(config, mode="train")
    vols = ds.read_batch_volumes(list(range(4)), n_threads=2)
    assert vols is not None and vols.shape == (4, 20, 20, 20)
    for j in range(4):
        np.testing.assert_allclose(np.asarray(vols[j]),
                                   ds.sample(j)["volume"], atol=1e-5)


def test_gz_cache_corrupt_file_falls_back(tmp_path, monkeypatch):
    """A truncated .gz must fall back to the original path (EOFError is not
    an OSError) and leave no stray tmp files in the cache dir."""
    import gzip
    import os
    cache = tmp_path / "cache"
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(cache))
    vol = np.random.RandomState(6).randn(6, 7, 8).astype(np.float32)
    src = str(tmp_path / "t.nii.gz")
    nifti.save(src, vol)
    data = open(src, "rb").read()
    open(src, "wb").write(data[: len(data) // 2])     # truncate mid-stream
    assert nifti.readable_path(src) == src            # graceful fallback
    if cache.exists():
        assert not [f for f in os.listdir(cache) if ".tmp" in f]


def test_gz_cache_evicts_superseded_entries(tmp_path, monkeypatch):
    import os
    cache = tmp_path / "cache"
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(cache))
    src = str(tmp_path / "e.nii.gz")
    nifti.save(src, np.zeros((4, 4, 4), np.float32))
    first = nifti.readable_path(src)
    nifti.save(src, np.ones((4, 4, 4), np.float32))
    os.utime(src, ns=(os.stat(src).st_atime_ns,
                      os.stat(src).st_mtime_ns + 10_000_000))
    second = nifti.readable_path(src)
    assert second != first
    entries = [f for f in os.listdir(cache) if f.endswith("e.nii")]
    assert len(entries) == 1                          # stale copy evicted


def test_gz_cache_concurrent_inflation(tmp_path, monkeypatch):
    """Cold-cache inflation from many loader threads at once must publish a
    complete file (per-call tmp names; atomic replace) — every thread gets
    correct bytes."""
    from concurrent.futures import ThreadPoolExecutor

    cache = tmp_path / "cache"
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(cache))
    series = np.random.RandomState(7).randn(16, 17, 18, 3).astype(np.float32)
    src = str(tmp_path / "c.nii.gz")
    nifti.save(src, series)

    def read(_):
        img = nifti.load(src)
        return np.asarray(img.dataobj[..., 1])

    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(read, range(16)))
    for r in results:
        np.testing.assert_allclose(r, series[..., 1], atol=1e-6)
    import os
    assert not [f for f in os.listdir(cache) if ".tmp" in f]


def test_gz_cache_same_basename_different_dirs_coexist(tmp_path, monkeypatch):
    """Eviction is scoped to the SOURCE PATH, not the basename: subjects
    that all name their file func.nii.gz (the standard neuroimaging layout)
    must not evict each other — basename-scoped eviction thrashed the cache
    back to a per-access full gunzip."""
    import os
    cache = tmp_path / "cache"
    monkeypatch.setenv("NEUROVIT_GZ_CACHE_DIR", str(cache))
    paths, vols = [], []
    for sub in ("sub-01", "sub-02", "sub-03"):
        d = tmp_path / sub
        d.mkdir()
        src = str(d / "func.nii.gz")
        vol = np.full((4, 4, 4), float(len(paths)), np.float32)
        nifti.save(src, vol)
        paths.append(src)
        vols.append(vol)
    firsts = [nifti.readable_path(p) for p in paths]
    assert len(set(firsts)) == 3
    # Revisit in shuffled order: every entry must still be a cache HIT
    # (same resolved path, still on disk) — no mutual eviction.
    for i in (1, 0, 2, 1, 0):
        again = nifti.readable_path(paths[i])
        assert again == firsts[i] and os.path.exists(again)
        np.testing.assert_array_equal(
            np.asarray(nifti.load(again).dataobj), vols[i])
    entries = [f for f in os.listdir(cache) if f.endswith("func.nii")]
    assert len(entries) == 3
