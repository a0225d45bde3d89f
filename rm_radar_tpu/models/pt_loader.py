"""Ultralytics-free (and torch-free) reader for PyTorch ``.pt`` checkpoints.

The reference consumes real Ultralytics exports (reference
src/detect/detector.cpp:177-243). An Ultralytics ``.pt`` is a zip archive
holding a pickle (``data.pkl``) whose object graph references
``ultralytics.nn.tasks.DetectionModel`` and dozens of ``torch.nn`` classes —
``torch.load`` therefore fails without the ``ultralytics`` package
installed. This loader reads the archive with nothing but the standard
library (+ numpy): every foreign class is reconstructed as a generic stub
object, tensor storages are materialized straight from the zip entries, and
the module tree is walked exactly the way ``nn.Module.state_dict`` walks it
(``_parameters`` / ``_buffers`` / ``_modules``), yielding the same
``{"model.0.conv.weight": ndarray, ...}`` mapping a real
``ckpt["model"].state_dict()`` would produce.

Validated in tests/test_pt_real.py against a genuine torch-serialized
archive (real zip layout, real persistent-id storage records, real
``ultralytics.nn.tasks`` class references) that torch.load itself cannot
open without ultralytics.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

# Legacy torch storage classes (still what torch.save records) -> dtype.
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


class _StorageType:
    """Marker for a referenced torch storage class (dtype carrier)."""

    def __init__(self, name: str):
        self.name = name
        if name == "BFloat16Storage":
            import ml_dtypes  # ships with jax

            self.dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            self.dtype = _STORAGE_DTYPES.get(name, np.dtype("<f4"))


class _Stub:
    """Generic stand-in for any foreign class in the pickle stream."""

    _qualname = "?"

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            # (dict_state, slots_state)
            if state[0]:
                self.__dict__.update(state[0])
            if state[1]:
                self.__dict__.update(state[1])
        else:
            self.__dict__["_state"] = state

    def __call__(self, *args, **kwargs):  # e.g. _reconstructor patterns
        return self


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False, hooks=None,
    metadata=None,
):
    arr, dtype = storage
    itemsize = dtype.itemsize
    flat = np.frombuffer(arr, dtype=dtype)
    if not size:
        return flat[storage_offset].copy()
    byte_strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=tuple(size), strides=byte_strides
    )
    return view.copy()


def _rebuild_parameter(tensor, requires_grad=False, hooks=None):
    return tensor


class _PtUnpickler(pickle.Unpickler):
    def __init__(self, data: bytes, zf: zipfile.ZipFile, prefix: str):
        super().__init__(io.BytesIO(data))
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES or (
            module == "torch" and name == "BFloat16Storage"
        ):
            return _StorageType(name)
        if module.startswith("collections"):
            import collections

            return getattr(collections, name)
        if module == "builtins":
            import builtins

            return getattr(builtins, name)
        # Everything else (ultralytics.*, torch.nn.*, numpy scalar types in
        # train_args, ...) becomes a named stub class.
        return type(
            name, (_Stub,), {"_qualname": f"{module}.{name}"}
        )

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage", pid
        dtype = (
            storage_type.dtype
            if isinstance(storage_type, _StorageType)
            else np.dtype("<f4")
        )
        data = self._zf.read(f"{self._prefix}data/{key}")
        return (data, dtype)


def load_pt_objects(path: str) -> Any:
    """Unpickle a torch zip checkpoint into stub objects + numpy tensors."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(
            n for n in zf.namelist() if n.endswith("data.pkl")
        )
        prefix = pkl_name[: -len("data.pkl")]
        return _PtUnpickler(zf.read(pkl_name), zf, prefix).load()


def module_state_dict(module: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk a stubbed ``nn.Module`` tree exactly like
    ``nn.Module.state_dict``: parameters, buffers, then children."""
    out: Dict[str, np.ndarray] = {}
    d = getattr(module, "__dict__", {})
    for coll in ("_parameters", "_buffers"):
        for name, value in (d.get(coll) or {}).items():
            if value is None:
                continue
            out[prefix + name] = np.asarray(value)
    for name, child in (d.get("_modules") or {}).items():
        if child is None:
            continue
        out.update(module_state_dict(child, prefix + name + "."))
    return out


def load_ultralytics_state_dict(path: str) -> Dict[str, np.ndarray]:
    """``.pt`` checkpoint -> {"model.0.conv.weight": float32 ndarray, ...}.

    Accepts the standard Ultralytics layout ({"model": DetectionModel, ...})
    or a bare module / state-dict pickle. Half/bfloat16 tensors are widened
    to float32 (the ``model.float()`` the torch path applies).
    """
    obj = load_pt_objects(path)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict):  # plain state_dict
        sd = {k: np.asarray(v) for k, v in obj.items()}
    else:
        sd = module_state_dict(obj)
    return {
        k: (
            v.astype(np.float32)
            if v.dtype.kind == "f" and v.dtype.itemsize < 4
            or v.dtype.name == "bfloat16"
            else v
        )
        for k, v in sd.items()
    }
