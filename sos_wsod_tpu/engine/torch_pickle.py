"""Torch-free reader for PyTorch ``.pth`` checkpoints.

The reference distributes trained models as torch-pickled checkpoints (stage-1
OICR+ VGG16 models, stage-2/3 ubteacher ``EnsembleTSModel`` checkpoints loaded
via fvcore's Checkpointer — reference: unbias/ubteacher/checkpoint/
detection_checkpoint.py:10-113, tools/convert2detectron2.py:14-24). This module
parses both torch serialization formats without importing torch, returning
nested Python structures whose tensors are numpy arrays:

 - the zip format (default since torch 1.6): ``<name>/data.pkl`` pickle whose
   persistent IDs ``('storage', StorageType, key, location, numel)`` point at
   raw little-endian buffers ``<name>/data/<key>``;
 - the legacy format: magic/protocol/sysinfo pickles, the main pickle, a
   pickled list of storage keys, then each storage as ``int64 numel`` + raw
   bytes, in key order.

Tensors are rebuilt from (storage, offset, size, stride) with numpy
``as_strided`` and copied into contiguous arrays. bfloat16 uses ml_dtypes
(ships with jax). Unknown classes degrade to inert placeholders so that
optimizer state / scheduler objects inside a checkpoint don't break model
loading.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

try:  # jax dependency, always present here
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = np.dtype(np.uint16)  # raw-bits fallback

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
    "UntypedStorage": np.dtype("u1"),
}


class _StorageType:
    """Marker returned by find_class for ``torch.XStorage`` globals."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name, np.dtype("u1"))


class _Placeholder:
    """Inert stand-in for non-tensor torch classes (schedulers, dtypes, ...)."""

    def __init__(self, module: str, name: str, *args: Any):
        self._module, self._name, self._args = module, name, args
        self.__dict__["_state"] = None

    def __call__(self, *args: Any, **kwargs: Any) -> "_Placeholder":
        return _Placeholder(self._module, self._name, args)

    def __setstate__(self, state: Any) -> None:
        self.__dict__["_state"] = state

    def __repr__(self) -> str:  # pragma: no cover
        return f"<torch_pickle placeholder {self._module}.{self._name}>"


def _rebuild_tensor(storage: np.ndarray, offset: int, size, stride, copy: bool = True):
    if not size:
        view = storage[offset : offset + 1].reshape(())
    else:
        itemsize = storage.dtype.itemsize
        strides = tuple(int(s) * itemsize for s in stride)
        view = np.lib.stride_tricks.as_strided(
            storage[offset:], shape=tuple(int(s) for s in size), strides=strides
        )
    return np.ascontiguousarray(view) if copy else view


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None) -> np.ndarray:
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, f: BinaryIO, load_storage, copy_tensors: bool = True):
        super().__init__(f, encoding="latin1")
        self._load_storage = load_storage
        self._copy = copy_tensors

    def find_class(self, module: str, name: str) -> Any:
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                copy = self._copy

                def rebuild(storage, offset, size, stride, *unused):
                    return _rebuild_tensor(storage, offset, size, stride, copy=copy)

                return rebuild
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module.startswith("torch") and name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "builtins":
            return getattr(__import__("builtins"), name)
        if module.startswith(("torch", "numpy", "fvcore", "detectron2", "yacs", "argparse")):
            return _Placeholder(module, name)
        raise pickle.UnpicklingError(f"refusing to load global {module}.{name}")

    def persistent_load(self, pid: Any) -> np.ndarray:
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = storage_type.dtype if isinstance(storage_type, _StorageType) else np.dtype("u1")
        return self._load_storage(str(key), dtype, int(numel))


def _load_zip(path: str) -> Any:
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
    prefix = pkl_name[: -len("data.pkl")]
    cache: Dict[str, np.ndarray] = {}

    def load_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
        ck = f"{key}:{dtype.str}"
        if ck not in cache:
            raw = zf.read(f"{prefix}data/{key}")
            cache[ck] = np.frombuffer(raw, dtype=dtype).copy()
        return cache[ck]

    with zf.open(pkl_name) as f:
        return _Unpickler(io.BytesIO(f.read()), load_storage).load()


def _load_legacy(f: BinaryIO) -> Any:
    def read_pickle():
        return pickle.Unpickler(f, encoding="latin1").load()

    magic = read_pickle()
    if magic != _MAGIC_NUMBER:
        raise ValueError("not a legacy torch checkpoint (bad magic)")
    read_pickle()  # protocol version
    read_pickle()  # sys info

    storages: Dict[str, tuple] = {}
    arrays: Dict[str, np.ndarray] = {}

    def load_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
        # Legacy files put all storage bytes AFTER the main pickle, so hand
        # out zero buffers now, patch them in place below; tensor rebuilds
        # return VIEWS (copy_tensors=False) that see the patched data, and we
        # copy to contiguous arrays at the very end.
        if key not in arrays:
            storages[key] = (dtype, numel)
            arrays[key] = np.zeros(numel, dtype=dtype)
        return arrays[key]

    result = _Unpickler(f, load_storage, copy_tensors=False).load()
    keys = pickle.Unpickler(f, encoding="latin1").load()
    for key in keys:
        dtype, _ = storages[str(key)]
        (numel,) = struct.unpack("<q", f.read(8))
        buf = f.read(numel * dtype.itemsize)
        arrays[str(key)][:] = np.frombuffer(buf, dtype=dtype)

    def materialize(node: Any) -> Any:
        if isinstance(node, np.ndarray):
            return np.ascontiguousarray(node)
        if isinstance(node, dict):
            return type(node)((k, materialize(v)) for k, v in node.items())
        if isinstance(node, (list, tuple)):
            return type(node)(materialize(v) for v in node)
        return node

    return materialize(result)


def torch_load(path: str) -> Any:
    """Parse a torch checkpoint (zip or legacy format) without torch.

    Tensors come back as numpy arrays; unknown torch objects as inert
    placeholders.
    """
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    with open(path, "rb") as f:
        return _load_legacy(f)


def state_dict_to_numpy(obj: Any) -> Dict[str, np.ndarray]:
    """Flatten a checkpoint object into {dotted_key: array}. Accepts the
    common containers: raw state_dict, {'model': sd}, {'state_dict': sd}."""
    if isinstance(obj, dict):
        for k in ("model", "state_dict"):
            inner = obj.get(k)
            if isinstance(inner, dict) and any(
                isinstance(v, np.ndarray) for v in inner.values()
            ):
                obj = inner
                break
    out: Dict[str, np.ndarray] = {}

    def walk(node: Any, prefix: tuple):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        elif isinstance(node, np.ndarray):
            out[".".join(prefix)] = node

    walk(obj, ())
    return out
