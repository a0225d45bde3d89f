#!/usr/bin/env python
"""Convert an Ultralytics YOLOv8 ONNX export to rm_radar_tpu .npz — with no
onnx-package dependency (it is not in this image): a minimal protobuf
wire-format reader extracts the graph initializers (TensorProtos), whose
names in Ultralytics exports are the torch module paths
("model.22.cv2.0.0.conv.weight", ...), so the same name mapping as
tools/convert_weights.py applies.

This covers the reference's deployment input directly: it builds TensorRT
engines from car.onnx / armor.onnx (reference src/detect/detector.cpp:
177-243); we read the same files into the Flax parameter tree.

Usage:
    python tools/convert_onnx.py car.onnx car.npz
"""

from __future__ import annotations

import struct
import sys
from typing import Dict, Iterator, Tuple

import numpy as np

# ONNX TensorProto dtypes we care about.
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    6: np.int32,
    7: np.int64,
    10: np.float16,
    11: np.float64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Iterate (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            value = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            value = buf[pos : pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            value = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    """TensorProto: 1=dims(varint, repeated), 2=data_type, 8=name,
    9=raw_data, 4=float_data (packed), 7=int64_data."""
    dims = []
    dtype = np.float32
    name = ""
    raw = b""
    floats = None
    int64s = None
    for field, wire, value in _fields(buf):
        if field == 1:
            dims.append(value)
        elif field == 2:
            dtype = _DTYPES.get(value, np.float32)
        elif field == 8:
            name = value.decode()
        elif field == 9:
            raw = value
        elif field == 4:
            floats = np.frombuffer(value, dtype="<f4") if wire == 2 else None
        elif field == 7:
            if wire == 2:
                out, pos = [], 0
                while pos < len(value):
                    v, pos = _read_varint(value, pos)
                    out.append(v)
                int64s = np.asarray(out, np.int64)
    if raw:
        arr = np.frombuffer(raw, dtype=dtype)
    elif floats is not None:
        arr = floats
    elif int64s is not None:
        arr = int64s
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims) if dims else arr


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """ModelProto: field 7 = graph (GraphProto); GraphProto: field 5 =
    initializer (TensorProto, repeated)."""
    with open(path, "rb") as f:
        model = f.read()
    tensors: Dict[str, np.ndarray] = {}
    for field, wire, value in _fields(model):
        if field == 7 and wire == 2:  # graph
            for gfield, gwire, gvalue in _fields(value):
                if gfield == 5 and gwire == 2:  # initializer
                    name, arr = _parse_tensor(gvalue)
                    if name:
                        tensors[name] = arr
    return tensors


class _NumpyTensor:
    """Duck-typed stand-in for a torch tensor in convert_weights mapping."""

    def __init__(self, arr: np.ndarray):
        self._arr = arr
        self.shape = arr.shape

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self._arr


def convert_onnx(path: str) -> Dict:
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from convert_weights import convert_state_dict

    tensors = read_onnx_initializers(path)
    state_dict = {
        name: _NumpyTensor(np.asarray(arr, np.float32))
        for name, arr in tensors.items()
        if arr.dtype in (np.float32, np.float16, np.float64)
        and ("conv.weight" in name or "bn." in name or name.endswith(("weight", "bias")))
    }
    return convert_state_dict(state_dict)


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    variables = convert_onnx(src)
    sys.path.insert(0, ".")
    from rm_radar_tpu.models.weights import save_variables

    save_variables(dst, variables)
    n = sum(
        np.asarray(x).size
        for x in __import__("jax").tree_util.tree_leaves(variables)
    )
    print(f"wrote {dst} ({n / 1e6:.2f}M params)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
