"""Torch-free reader for PyTorch ``.pth`` checkpoint files.

The reference saves checkpoints with ``torch.save(model.state_dict())``
(``src/Trainer.py:54-55``) — a zip archive containing a pickle of the
OrderedDict plus raw tensor storages. Migrating users shouldn't need torch
installed to bring their weights: this module parses the zip/pickle format
directly into {key: np.ndarray} with a restricted unpickler (only the
torch-tensor reconstruction opcodes are honored; everything else is
rejected), covering torch >= 1.6 zip-format files, the format the reference
produces.

    sd = load_torch_state_dict("3DViT_ADNI_patch9_batch32.pth")
    params = state_dict.load_into(model, params, sd, strict=False)
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,            # handled specially below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    def __init__(self, dtype_name: str, key: str):
        self.dtype_name = dtype_name
        self.key = key


class _LazyTensor:
    """Deferred tensor: materialized once storage bytes are available."""

    def __init__(self, storage: _StorageRef, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialize(self, raw: bytes) -> np.ndarray:
        if self.storage.dtype_name == "BFloat16Storage":
            # numpy lacks bf16: widen via the int16 bit pattern -> f32.
            bits = np.frombuffer(raw, dtype=np.uint16)
            data = (bits.astype(np.uint32) << 16).view(np.float32)
        else:
            dtype = _STORAGE_DTYPES[self.storage.dtype_name]
            data = np.frombuffer(raw, dtype=dtype)
        if not self.size:
            return data[self.offset].copy()
        itemsize = data.dtype.itemsize
        strided = np.lib.stride_tricks.as_strided(
            data[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride))
        return np.ascontiguousarray(strided)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    return _LazyTensor(storage, storage_offset, size, stride)


class _RestrictedUnpickler(pickle.Unpickler):
    """Allows only the constructs torch state_dict pickles contain."""

    _ALLOWED = {
        # real OrderedDict: state_dicts carry a `_metadata` attribute that
        # the pickle BUILD op sets on the instance (plain dict can't).
        ("collections", "OrderedDict"): __import__("collections").OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    }

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return name  # storage *type tag*, consumed by persistent_load
        raise pickle.UnpicklingError(
            f"{module}.{name} is not allowed in checkpoint files")

    def persistent_load(self, pid):
        # ('storage', <storage type tag>, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        _, storage_type, key, _location, _numel = pid
        name = storage_type if isinstance(storage_type, str) else \
            getattr(storage_type, "__name__", str(storage_type))
        if name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        return _StorageRef(name, str(key))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch.save'd state_dict (zip format, torch >= 1.6) into
    {key: np.ndarray} without importing torch."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        obj = _RestrictedUnpickler(io.BytesIO(zf.read(pkl_name))).load()

        def resolve(value: Any) -> Any:
            if isinstance(value, _LazyTensor):
                raw = zf.read(f"{prefix}data/{value.storage.key}")
                return value.materialize(raw)
            if isinstance(value, dict):
                return {k: resolve(v) for k, v in value.items()}
            return value

        out = resolve(obj)
    if not isinstance(out, dict):
        raise ValueError(f"{path} does not contain a state_dict "
                         f"(got {type(out).__name__})")
    return out
