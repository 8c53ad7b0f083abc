"""Isolated native-reader microbench: nvt_read_timepoint / nvt_read_batch
vs the pure-numpy memmap path, with DataLoader overhead excluded.

Decides the VERDICT round-1 question: does the C++ reader (csrc/) win any
realistic scenario? Measures the exact hot operation of the reference
(DatasetADNI.py:211-213: ``dataobj[1:, 10:-9, 1:, t]`` then z-score) on a
synthetic 91x109x91xT corpus, warm page cache.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

from neurovit_tpu.data import native_io, nifti

N_FILES = 6
N_T = 24
CROP = ((1, 0), (10, -9), (1, 0))  # numpy [1:, 10:-9, 1:]
SHAPE_OUT = (90, 90, 90)
REPS = 3


def build_corpus(root):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(N_FILES):
        path = os.path.join(root, f"sub{i}.nii")
        nifti.save(path, rng.randn(91, 109, 91, N_T).astype(np.float32))
        paths.append(path)
    return paths


def numpy_read(path, t):
    img = nifti.load(path)
    box = np.asarray(img.dataobj[1:, 10:-9, 1:, t], dtype=np.float32)
    mean, std = box.mean(), box.std()
    return (box - mean) / (std + 1e-8)


def bench(label, fn, n_samples):
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    rate = n_samples / best
    print(f"{label:34s}: {rate:8.1f} samples/sec")
    return rate


def main():
    root = tempfile.mkdtemp(prefix="nvt_iobench_")
    try:
        paths = build_corpus(root)
        work = [(p, t) for p in paths for t in range(N_T)]
        n = len(work)
        b_paths = [p for p, _ in work]
        b_tps = [t for _, t in work]

        # Warm the page cache.
        for p, t in work:
            numpy_read(p, t)

        results = {}
        results["numpy memmap"] = bench(
            "numpy memmap + zscore",
            lambda: [numpy_read(p, t) for p, t in work], n)
        if not native_io.available():
            print("native lib missing — cd csrc && make")
            return
        results["native single"] = bench(
            "native nvt_read_timepoint",
            lambda: [native_io.read_timepoint(p, t, CROP, SHAPE_OUT)
                     for p, t in work], n)
        # Thread sweep with CPU-seconds accounting. On this 1-core box the
        # wall rate cannot scale; what CAN be measured here is contention:
        # if total CPU-seconds per sample stays flat as threads grow, the
        # workers add no locking/synchronization overhead (the reader is
        # GIL-free C++ on a shared-immutable mmap), so on an N-core host the
        # aggregate rate scales ~min(N, threads) x the single-thread rate
        # until disk/memory bandwidth caps it.
        cpu_per_sample = {}
        for k in (1, 2, 4, 8):
            def run_batch(k=k):
                c0 = time.process_time()
                native_io.read_batch(b_paths, b_tps, CROP, SHAPE_OUT,
                                     n_threads=k)
                cpu = (time.process_time() - c0) / n
                # best-of-reps, like the wall numbers (1-core VM noise).
                cpu_per_sample[k] = min(cpu, cpu_per_sample.get(k, cpu))
            results[f"native batch t{k}"] = bench(
                f"native nvt_read_batch threads={k}", run_batch, n)
        base = results["numpy memmap"]
        for label, rate in results.items():
            if label != "numpy memmap":
                print(f"  {label}: {rate / base:.2f}x vs numpy")
        print("thread-contention check (CPU-seconds per sample; flat == "
              "no contention == core-count scaling expected):")
        for k, cpu in sorted(cpu_per_sample.items()):
            print(f"  threads={k}: {cpu * 1e3:6.2f} ms CPU/sample "
                  f"({cpu_per_sample[1] and cpu / cpu_per_sample[1]:.2f}x "
                  f"vs t1)")
    finally:
        native_io.clear_cache()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
