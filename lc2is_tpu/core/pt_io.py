"""Torch-free reader/writer for PyTorch ``.pt`` checkpoint files.

The reference stores its class-prototype table (``model/ade20k_prototypes.pt``,
loaded at ``model/model.py:22``) and its training checkpoints
(``engine.py:189`` — ``torch.save(model.state_dict())``) in the torch zip
serialization format.  To import those assets on a machine without torch on
the hot path we implement a minimal unpickler that understands the torch
persistent-storage protocol and materialises tensors as numpy arrays.

Format (torch >= 1.6 zip archives):
  archive/data.pkl     — a pickle of the saved object; tensors are encoded as
                         ``torch._utils._rebuild_tensor_v2(storage, offset,
                         size, stride, requires_grad, hooks)`` where
                         ``storage`` is a persistent-load tuple
                         ``('storage', StorageType, key, location, numel)``.
  archive/data/<key>   — the raw little-endian storage bytes.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially (numpy has no bf16)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` & co. found during unpickling."""

    def __init__(self, name: str):
        self.name = name

    def __repr__(self):  # pragma: no cover
        return f"_StorageType({self.name})"


class _Storage:
    """A raw storage: bytes + dtype, resolved lazily from the zip archive."""

    def __init__(self, data: bytes, dtype_name: str, numel: int):
        self.dtype_name = dtype_name
        self.numel = numel
        if dtype_name == "BFloat16Storage":
            raw = np.frombuffer(data, dtype=np.uint16, count=numel)
            widened = raw.astype(np.uint32) << 16
            self.array = widened.view(np.float32).copy()
        else:
            dt = _STORAGE_DTYPES[dtype_name]
            self.array = np.frombuffer(data, dtype=dt, count=numel).copy()


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride, *args):
    """numpy equivalent of ``torch._utils._rebuild_tensor_v2``."""
    size = tuple(size)
    stride = tuple(stride)
    flat = storage.array
    if len(size) == 0:
        return flat[storage_offset].copy()
    return np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=size,
        strides=tuple(s * flat.itemsize for s in stride),
    ).copy()


def _rebuild_parameter(data, requires_grad=True, hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, storages: Dict[str, _Storage]):
        super().__init__(file)
        self._storages = storages

    def find_class(self, module: str, name: str):
        if name in _STORAGE_DTYPES:
            return _StorageType(name)
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if (module, name) == ("collections", "OrderedDict"):
            return dict
        if name in ("int64", "int32", "float32", "float64"):  # numpy scalars
            return getattr(np, name)
        if module.startswith("torch"):
            # Any other torch object (device, dtype, Size...) — return a benign stub.
            return lambda *a, **k: None
        return super().find_class(module, name)

    def persistent_load(self, pid: Any):
        # pid = ('storage', StorageType, key, location, numel)
        assert isinstance(pid, tuple) and pid[0] == "storage", pid
        _, storage_type, key, _location, _numel = pid
        storage = self._storages[str(key)]
        assert storage.dtype_name == storage_type.name, (
            storage.dtype_name,
            storage_type.name,
        )
        return storage


def _dtype_numel(dtype_name: str, nbytes: int) -> int:
    if dtype_name == "BFloat16Storage":
        return nbytes // 2
    return nbytes // np.dtype(_STORAGE_DTYPES[dtype_name]).itemsize


def load_pt(path: str) -> Any:
    """Load a torch zip-format ``.pt`` file without torch.

    Tensors come back as numpy arrays (bf16 widened to fp32); containers as
    plain dict/list/tuple.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        pickled = zf.read(pkl_name)

        # First pass: discover storage dtypes by scanning the pickle for
        # persistent ids.  We do it in one pass instead: read every data/ entry
        # lazily on demand.
        storages: Dict[str, _Storage] = {}

        class _Resolver(_TorchUnpickler):
            def persistent_load(self, pid):
                _, storage_type, key, _location, numel = pid
                key = str(key)
                if key not in storages:
                    raw = zf.read(f"{prefix}data/{key}")
                    n = numel if numel else _dtype_numel(storage_type.name, len(raw))
                    storages[key] = _Storage(raw, storage_type.name, n)
                return storages[key]

        return _Resolver(io.BytesIO(pickled), storages).load()


# ---------------------------------------------------------------------------
# Writer: emit a torch-zip-compatible .pt so reference tooling can read OUR
# checkpoints too (the reverse direction of the import shim).
# ---------------------------------------------------------------------------

_NP_TO_STORAGE = {
    np.dtype(np.float32): ("FloatStorage", "torch.FloatStorage"),
    np.dtype(np.float64): ("DoubleStorage", "torch.DoubleStorage"),
    np.dtype(np.float16): ("HalfStorage", "torch.HalfStorage"),
    np.dtype(np.int64): ("LongStorage", "torch.LongStorage"),
    np.dtype(np.int32): ("IntStorage", "torch.IntStorage"),
    np.dtype(np.uint8): ("ByteStorage", "torch.ByteStorage"),
    np.dtype(np.bool_): ("BoolStorage", "torch.BoolStorage"),
}


def save_pt(obj: Dict[str, np.ndarray], path: str) -> None:
    """Save a flat dict of numpy arrays as a torch-loadable zip .pt file.

    Emits the same structure as ``torch.save(state_dict)`` (zip archive with
    data.pkl + raw storages) by writing the pickle stream manually.
    """
    keys = list(obj.keys())
    arrays = [np.ascontiguousarray(obj[k]) for k in keys]

    buf = io.BytesIO()
    w = buf.write
    w(b"\x80\x02")  # PROTO 2
    # Build an OrderedDict via: collections.OrderedDict, then setitems
    w(b"ccollections\nOrderedDict\n")
    w(b")R")  # empty-args REDUCE -> OrderedDict()
    w(b"(")  # MARK for SETITEMS
    for i, (k, arr) in enumerate(zip(keys, arrays)):
        _pickle_str(w, k)
        # value: torch._utils._rebuild_tensor_v2(pid, 0, shape, stride, False, {})
        w(b"ctorch._utils\n_rebuild_tensor_v2\n")
        w(b"(")  # MARK for args tuple
        # persistent id tuple: ('storage', torch.XStorage, key, 'cpu', numel)
        # pushed on the stack, then BINPERSID (b"Q") consumes it.
        storage_name, _ = _NP_TO_STORAGE[arr.dtype]
        w(b"(")
        _pickle_str(w, "storage")
        w(b"ctorch\n" + storage_name.encode() + b"\n")
        _pickle_str(w, str(i))
        _pickle_str(w, "cpu")
        _pickle_int(w, int(arr.size))
        w(b"t")
        w(b"Q")  # BINPERSID
        _pickle_int(w, 0)  # storage offset
        _pickle_int_tuple(w, arr.shape)
        _pickle_int_tuple(w, tuple(s // arr.itemsize for s in arr.strides))
        w(b"\x89")  # NEWFALSE (requires_grad)
        w(b"ccollections\nOrderedDict\n)R")  # empty hooks dict
        w(b"t")  # TUPLE of args
        w(b"R")  # REDUCE
    w(b"u")  # SETITEMS
    w(b".")  # STOP

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        for i, arr in enumerate(arrays):
            zf.writestr(f"archive/data/{i}", arr.tobytes())
        zf.writestr("archive/version", "3\n")


def _pickle_str(w, s: str):
    b = s.encode("utf-8")
    if len(b) < 256:
        w(b"U" + struct.pack("<B", len(b)) + b)  # SHORT_BINSTRING-compatible
    else:
        w(b"T" + struct.pack("<I", len(b)) + b)


def _pickle_int(w, i: int):
    if 0 <= i < 2**16:
        if i < 256:
            w(b"K" + struct.pack("<B", i))
        else:
            w(b"M" + struct.pack("<H", i))
    else:
        w(b"J" + struct.pack("<i", i))


def _pickle_int_tuple(w, t):
    w(b"(")
    for i in t:
        _pickle_int(w, int(i))
    w(b"t")
