"""Host data-pipeline benchmark: native C++ reader vs Python memmap path.

Generates a synthetic ADNI-like NIfTI corpus (full 91x109x91 geometry) and
measures end-to-end DataLoader throughput (samples/sec) for both read paths.
"""

import os
import pickle
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

from neurovit_tpu.data import native_io, nifti
from neurovit_tpu.data.adni import ADNIDataset
from neurovit_tpu.data.loader import DataLoader

N_FILES = 8
N_T = 20
BATCH = 32
WORKERS = 8


def build_corpus(root, suffix=".nii"):
    rng = np.random.RandomState(0)
    samples = []
    for i in range(N_FILES):
        path = os.path.join(root, f"sub{i}{suffix}")
        nifti.save(path, rng.randn(91, 109, 91, N_T).astype(np.float32))
        for t in range(N_T):
            samples.append((f"S{i:03d}", t, path, "CN", "F", 60 + i))
    pkl = os.path.join(root, f"index{suffix}.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(samples, f)
    return pkl


def run(dataset, label, reps=3):
    loader = DataLoader(dataset, BATCH, shuffle=True, num_workers=WORKERS,
                        seed=0)
    # warmup (page cache)
    for _ in loader:
        pass
    best = 0.0
    for _ in range(reps):  # best-of-N: this 1-core VM is noisy
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += int(batch["valid"].sum())
        best = max(best, n / (time.perf_counter() - t0))
    print(f"{label:22s}: {best:8.1f} samples/sec "
          f"({1e3/best*BATCH:.1f} ms/batch of {BATCH})")
    return best


def main():
    root = tempfile.mkdtemp(prefix="nvt_databench_")
    try:
        pkl = build_corpus(root)
        config = {"ADNI_CSV_PATH": "", "ADNI_TRAIN_PATH": pkl,
                  "ADNI_VAL_PATH": pkl, "DATASET_SPLIT_RATIO": 0.85,
                  "DATASET_TASK": "age", "DATASET_TRANSFORMS": False,
                  "TRAINING_VIT_INPUT_SIZE": 90, "TRAINING_SEED": 0,
                  "DATA_NATIVE_IO": True}
        ds = ADNIDataset(config, mode="train")
        assert native_io.available(), "build csrc first (cd csrc && make)"
        native = run(ds, "native C++ reader")

        # Force the Python path by pretending the lib can't serve .nii.
        orig = native_io.usable_for
        native_io.usable_for = lambda path: False
        try:
            python = run(ds, "python memmap reader")
        finally:
            native_io.usable_for = orig
        print(f"native speedup: {native/python:.2f}x")

        # ---- .nii.gz corpus: decompressed cache vs per-load gunzip -------
        pkl_gz = build_corpus(root, suffix=".nii.gz")
        config_gz = dict(config, ADNI_TRAIN_PATH=pkl_gz, ADNI_VAL_PATH=pkl_gz)
        ds_gz = ADNIDataset(config_gz, mode="train")
        os.environ["NEUROVIT_GZ_CACHE_DIR"] = os.path.join(root, "gzcache")
        nifti.clear_gz_cache()
        t0 = time.perf_counter()
        for p in {row[2] for row in ds_gz.data}:
            nifti.readable_path(p)                 # one-time inflate cost
        inflate_s = time.perf_counter() - t0
        gz_cached = run(ds_gz, "gz (decompressed cache)")
        print(f"  one-time inflate: {inflate_s:.2f}s for {N_FILES} files")
        os.environ["NEUROVIT_GZ_CACHE"] = "0"
        try:
            gz_raw = run(ds_gz, "gz (per-load gunzip)")
        finally:
            del os.environ["NEUROVIT_GZ_CACHE"]
        print(f"gz cache speedup: {gz_cached/gz_raw:.2f}x; "
              f"cached-vs-.nii: {gz_cached/native:.2f}x")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        nifti.clear_gz_cache()


if __name__ == "__main__":
    main()
