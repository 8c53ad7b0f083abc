"""Torch-free reader AND writer for PyTorch ``.pth`` checkpoint files.

The reference saves checkpoints with ``torch.save(model.state_dict())``
(``src/Trainer.py:54-55``) — a zip archive containing a pickle of the
OrderedDict plus raw tensor storages. Migrating users shouldn't need torch
installed to exchange weights in either direction:

* ``load_torch_state_dict`` parses the zip/pickle format directly into
  {key: np.ndarray} with a restricted unpickler (only the torch-tensor
  reconstruction opcodes are honored; everything else is rejected),
  covering torch >= 1.6 zip-format files, the format the reference
  produces.
* ``save_torch_state_dict`` emits the same format by hand-assembling the
  protocol-2 pickle opcodes (``OrderedDict`` + ``_rebuild_tensor_v2`` +
  storage persistent-ids — exactly the vocabulary ``torch.load`` with the
  default ``weights_only=True`` accepts), so checkpoints trained here open
  in the reference's own torch tooling (e.g. its CAM scripts'
  ``torch.load(BEST_MODEL_PATH)``,
  ``explainability/xAi_gradcam_Resnet3D/gradcam.py:27-28``).

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


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------

# numpy dtype -> (torch storage class name, raw-bytes converter)
_WRITE_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


def _op_str(s: str) -> bytes:
    b = s.encode("utf-8")
    import struct
    return b"X" + struct.pack("<I", len(b)) + b          # BINUNICODE


def _op_int(n: int) -> bytes:
    import struct
    if 0 <= n < 256:
        return b"K" + bytes([n])                          # BININT1
    if 0 <= n < 65536:
        return b"M" + struct.pack("<H", n)                # BININT2
    return b"J" + struct.pack("<i", n)                    # BININT


def _op_global(module: str, name: str) -> bytes:
    return b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _op_tuple(items: bytes, n: int) -> bytes:
    if n <= 3:
        return items + (b")", b"\x85", b"\x86", b"\x87")[n]
    return b"(" + items + b"t"                            # MARK ... TUPLE


def _pickle_tensor(storage_name: str, key: str, arr: np.ndarray) -> bytes:
    """_rebuild_tensor_v2(storage_pid, 0, size, stride, False, OrderedDict())
    with C-contiguous element strides, the layout torch.save emits."""
    size = _op_tuple(b"".join(_op_int(d) for d in arr.shape), arr.ndim)
    strides = []
    acc = 1
    for d in reversed(arr.shape):
        strides.append(acc)
        acc *= d
    stride = _op_tuple(b"".join(_op_int(s) for s in reversed(strides)),
                       arr.ndim)
    pid = _op_tuple(_op_str("storage") + _op_global("torch", storage_name)
                    + _op_str(key) + _op_str("cpu") + _op_int(arr.size), 5)
    empty_od = _op_global("collections", "OrderedDict") + b")R"
    args = _op_tuple(pid + b"Q"                           # BINPERSID
                     + _op_int(0) + size + stride
                     + b"\x89"                            # NEWFALSE
                     + empty_od, 6)
    return (_op_global("torch._utils", "_rebuild_tensor_v2") + args
            + b"R")                                       # REDUCE


def save_torch_state_dict(path: str, state_dict: Dict[str, Any]) -> None:
    """Write {key: array} as a ``torch.save``-format zip (torch >= 1.6),
    without importing torch.  Loads under ``torch.load(path)`` (including
    the default ``weights_only=True``) and under our own reader."""
    entries = []
    body = bytearray()
    body += b"\x80\x02"                                   # PROTO 2
    body += _op_global("collections", "OrderedDict") + b")R"
    body += b"("                                          # MARK
    for i, (k, v) in enumerate(state_dict.items()):
        arr = np.asarray(v)
        if arr.ndim and not arr.flags.c_contiguous:
            arr = np.ascontiguousarray(arr)   # (0-d stays 0-d: torch keeps
            #                                   scalar entries shape ())
        if arr.dtype in _WRITE_STORAGE:
            name, raw = _WRITE_STORAGE[arr.dtype], arr.tobytes()
        elif arr.dtype.name == "bfloat16":                # ml_dtypes bf16
            name, raw = "BFloat16Storage", arr.view(np.uint16).tobytes()
        else:
            raise TypeError(f"cannot export dtype {arr.dtype} for {k!r}")
        body += _op_str(k) + _pickle_tensor(name, str(i), arr)
        entries.append((str(i), raw))
    body += b"u."                                         # SETITEMS, STOP

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bytes(body))
        for key, raw in entries:
            zf.writestr(f"archive/data/{key}", raw)
        zf.writestr("archive/version", "3\n")
        # torch >= 2.1 records the serialization layout; harmless earlier.
        zf.writestr("archive/byteorder", "little")


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
