"""Torch-free reader AND writer for PyTorch ``.pth`` checkpoint files.

The reference saves checkpoints with ``torch.save(model.state_dict())``
(``src/Trainer.py:54-55``) — a zip archive containing a pickle of the
OrderedDict plus raw tensor storages. Migrating users shouldn't need torch
installed to exchange weights in either direction:

* ``load_torch_state_dict`` parses the zip/pickle format directly into
  {key: np.ndarray} with a restricted unpickler (only the torch-tensor
  reconstruction opcodes are honored; everything else is rejected),
  covering torch >= 1.6 zip-format files (the format the reference
  produces) AND the legacy pre-1.6 pickle-stream format
  (``torch.save(..., _use_new_zipfile_serialization=False)`` — magic /
  protocol / sys-info pickles, the object pickle, then length-prefixed
  raw storages), which real old ADNI checkpoints in the wild can carry.
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


def _element_size(dtype_name: str) -> int:
    if dtype_name == "BFloat16Storage":
        return 2
    return np.dtype(_STORAGE_DTYPES[dtype_name]).itemsize


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


def _rebuild_tensor(storage, storage_offset, size, stride):
    # Ancient torch (< 0.4) reduced tensors through _rebuild_tensor; legacy
    # pickle-stream files can still carry it.
    return _LazyTensor(storage, storage_offset, size, stride)


class _RestrictedUnpickler(pickle.Unpickler):
    """Allows only the constructs torch state_dict pickles contain.

    Tracks every storage persistent-id it resolves in ``self.storages``
    (root key -> _StorageRef) — the legacy pickle-stream loader needs the
    per-key dtypes to size the length-prefixed raw storage reads that
    follow the object pickle."""

    _ALLOWED = {
        # real OrderedDict: state_dicts carry a `_metadata` attribute that
        # the pickle BUILD op sets on the instance (plain dict can't).
        ("collections", "OrderedDict"): __import__("collections").OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    }

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.storages: Dict[str, _StorageRef] = {}

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return name  # storage *type tag*, consumed by persistent_load
        raise pickle.UnpicklingError(
            f"{module}.{name} is not allowed in checkpoint files")

    def persistent_load(self, pid):
        # zip format:    ('storage', <type tag>, key, location, numel)
        # legacy stream: ('storage', <type tag>, root_key, location, numel,
        #                 view_metadata)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        if len(pid) == 5:
            _, storage_type, key, _location, _numel = pid
        elif len(pid) == 6:
            _, storage_type, key, _location, _numel, view_metadata = pid
            if view_metadata:
                # Views (tensors aliasing slices of a shared root storage)
                # don't occur in state_dicts the reference tooling writes;
                # refuse rather than silently mis-slice.
                raise pickle.UnpicklingError(
                    "legacy checkpoint uses storage views (shared-memory "
                    "tensors) — not supported")
        else:
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        name = storage_type if isinstance(storage_type, str) else \
            getattr(storage_type, "__name__", str(storage_type))
        if name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        ref = self.storages.setdefault(str(key), _StorageRef(name, str(key)))
        return ref


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


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_LEGACY_PROTOCOL = 1001


def _resolve_tree(value: Any, read_storage) -> Any:
    if isinstance(value, _LazyTensor):
        return value.materialize(read_storage(value.storage.key))
    if isinstance(value, dict):
        return {k: _resolve_tree(v, read_storage) for k, v in value.items()}
    return value


def _load_legacy_state_dict(f) -> Dict[str, np.ndarray]:
    """Pre-1.6 ``torch.save`` stream: MAGIC, PROTOCOL and sys-info pickles,
    the object pickle (tensors as 6-tuple storage persistent ids), a pickle
    of the serialized storage keys, then for each key an int64-LE element
    count followed by the raw bytes (``_legacy_save`` layout)."""
    import struct

    if _RestrictedUnpickler(f).load() != _LEGACY_MAGIC:
        raise ValueError("not a torch checkpoint (bad legacy magic number)")
    protocol = _RestrictedUnpickler(f).load()
    if protocol != _LEGACY_PROTOCOL:
        raise ValueError(f"unsupported legacy torch protocol {protocol}")
    _sys_info = _RestrictedUnpickler(f).load()
    unpickler = _RestrictedUnpickler(f)
    obj = unpickler.load()
    storage_keys = _RestrictedUnpickler(f).load()

    raws: Dict[str, bytes] = {}
    for key in storage_keys:
        key = str(key)
        (numel,) = struct.unpack("<q", f.read(8))
        ref = unpickler.storages.get(key)
        if ref is None:
            raise ValueError(f"legacy checkpoint storage {key!r} is never "
                             "referenced by the object pickle")
        raws[key] = f.read(numel * _element_size(ref.dtype_name))

    out = _resolve_tree(obj, raws.__getitem__)
    if not isinstance(out, dict):
        raise ValueError(f"checkpoint does not contain a state_dict "
                         f"(got {type(out).__name__})")
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch.save'd state_dict into {key: np.ndarray} without
    importing torch. Handles both the zip format (torch >= 1.6) and the
    legacy pickle-stream format (pre-1.6 /
    ``_use_new_zipfile_serialization=False``)."""
    if not zipfile.is_zipfile(path):
        with open(path, "rb") as f:
            return _load_legacy_state_dict(f)
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        obj = _RestrictedUnpickler(io.BytesIO(zf.read(pkl_name))).load()
        out = _resolve_tree(obj, lambda key: zf.read(f"{prefix}data/{key}"))
    if not isinstance(out, dict):
        raise ValueError(f"{path} does not contain a state_dict "
                         f"(got {type(out).__name__})")
    return out
