"""ctypes bindings for the native (C++) NIfTI batch reader.

Loads ``_nifti_native.so`` (built by ``csrc/Makefile``; see
``csrc/nifti_native.cpp``). When the library is absent or a file is
unsupported (.nii.gz, exotic dtypes), callers fall back to the pure-Python
codec in ``nifti.py`` — behavior is identical, only slower.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_nifti_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nvt_read_timepoint.restype = ctypes.c_int
    lib.nvt_read_timepoint.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.nvt_read_batch.restype = ctypes.c_int
    lib.nvt_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
    lib.nvt_clear_cache.restype = None
    lib.nvt_clear_cache.argtypes = []
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def usable_for(path: str) -> bool:
    return available() and not path.endswith(".gz")


def read_timepoint(path: str, timepoint: int,
                   crop: Tuple[Tuple[int, int], ...],
                   shape_out: Tuple[int, int, int],
                   zscore: int = 1) -> Optional[np.ndarray]:
    """Cropped, optionally normalized single-timepoint read.

    zscore: 0 = raw, 1 = (v-mean)/(std+1e-8) (ADNI), 2 = Pain's std>0 guard.

    crop = ((x0, x1), (y0, y1), (z0, z1)); non-positive upper bounds count
    from the end (numpy negative-slice semantics).
    Returns None on failure (caller falls back to Python).

    The C kernel writes z-major ([Z, Y, X] C-order) so the gather is pure
    contiguous row copies; the result here is the zero-copy [X, Y, Z]
    transpose view — same values and indexing as the numpy path, F-ordered
    memory.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty(shape_out[::-1], np.float32)
    rc = lib.nvt_read_timepoint(
        path.encode(), timepoint,
        crop[0][0], crop[0][1], crop[1][0], crop[1][1],
        crop[2][0], crop[2][1], int(zscore),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.transpose(2, 1, 0) if rc == 0 else None


def read_batch(paths: Sequence[str], timepoints: Sequence[int],
               crop: Tuple[Tuple[int, int], ...],
               shape_out: Tuple[int, int, int],
               zscore: int = 1,
               n_threads: int = 8) -> Optional[np.ndarray]:
    """Threaded batch read -> [N, *shape_out] float32; None on any failure.

    Per-sample memory is z-major (see read_timepoint); the returned array is
    the zero-copy [N, X, Y, Z] transpose view.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n,) + tuple(shape_out)[::-1], np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_tp = (ctypes.c_int64 * n)(*[int(t) for t in timepoints])
    failures = lib.nvt_read_batch(
        c_paths, c_tp, n,
        crop[0][0], crop[0][1], crop[1][0], crop[1][1],
        crop[2][0], crop[2][1], int(zscore),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(np.prod(shape_out)), n_threads)
    if failures != 0:
        # Distinct from the None "fast path not available" cases: the
        # whole-batch read RAN and some file failed at the C level (e.g.
        # truncated data section). Raising lets the loader latch its
        # per-sample fallback instead of re-paying this doomed read on
        # every subsequent batch.
        raise RuntimeError(
            f"native batch read failed for {failures} of {n} file(s)")
    return out.transpose(0, 3, 2, 1)


def clear_cache() -> None:
    lib = _load()
    if lib is not None:
        lib.nvt_clear_cache()
