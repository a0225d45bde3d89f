#!/usr/bin/env python
"""Export rm_radar_tpu weights as a genuine Ultralytics-format YOLOv8 ONNX.

The reference consumes real Ultralytics ONNX exports (car.onnx/armor.onnx,
reference src/detect/detector.cpp:177-243). Those blobs are absent from the
snapshot, so this tool *produces* one: a complete, valid ONNX ModelProto —
full inference graph (Conv/Sigmoid/Mul blocks, C2f Split/Concat, SPPF
MaxPools, Resize upsampling, the DFL decode subgraph with baked anchor/stride
constants) with BatchNorm folded into the convolutions and the standard
Ultralytics initializer naming ("model.22.cv2.0.0.conv.weight", ...), exactly
the layout an `ultralytics` `model.export(format="onnx")` emits.

Serialized with a built-in protobuf wire-format writer (the `onnx` package is
not in this image); readable by onnxruntime/netron/TensorRT — and by
tools/convert_onnx.py, which closes the round trip: export -> ingest ->
identical cascade (tests/test_onnx_real.py).

Checkpoints trained with the space-to-depth stem are projected back to the
standard k3/s2 stem (models/weights.stem_kernel_from_s2d); the dropped
out-of-support taps are reported.

Usage:
    python tools/export_onnx.py assets/models/car_synth_m.npz car.onnx \
        --variant m --classes 1 [--size 640]
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# ------------------------------------------------------------ protobuf wire


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _vfield(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _lfield(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _sfield(field: int, s: str) -> bytes:
    return _lfield(field, s.encode())


_ONNX_DTYPE = {"float32": 1, "int64": 7, "int32": 6, "float16": 10}


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    body = b"".join(_vfield(1, int(d)) for d in arr.shape)
    body += _vfield(2, _ONNX_DTYPE[arr.dtype.name])
    body += _sfield(8, name)
    body += _lfield(9, arr.tobytes())
    return body


def _attr(name: str, value) -> bytes:
    body = _sfield(1, name)
    if isinstance(value, float):
        body += _tag(2, 5) + struct.pack("<f", value) + _vfield(20, 1)
    elif isinstance(value, bool) or isinstance(value, int):
        body += _vfield(3, int(value)) + _vfield(20, 2)
    elif isinstance(value, str):
        body += _lfield(4, value.encode()) + _vfield(20, 3)
    elif isinstance(value, (list, tuple)) and all(
        isinstance(v, int) for v in value
    ):
        packed = b"".join(_varint(int(v)) for v in value)
        body += _lfield(8, packed) + _vfield(20, 7)
    else:
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return body


def node_proto(
    op: str, inputs: List[str], outputs: List[str], name: str, **attrs
) -> bytes:
    body = b"".join(_sfield(1, i) for i in inputs)
    body += b"".join(_sfield(2, o) for o in outputs)
    body += _sfield(3, name)
    body += _sfield(4, op)
    body += b"".join(_lfield(5, _attr(k, v)) for k, v in attrs.items())
    return body


def value_info(name: str, elem_type: int, shape) -> bytes:
    dims = b"".join(_lfield(1, _vfield(1, int(d))) for d in shape)
    tensor_t = _vfield(1, elem_type) + _lfield(2, dims)
    return _sfield(1, name) + _lfield(2, _lfield(1, tensor_t))


# ------------------------------------------------------------ graph builder


class GraphBuilder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.inits: Dict[str, np.ndarray] = {}
        self._n = 0

    def init(self, name: str, arr: np.ndarray) -> str:
        self.inits[name] = np.ascontiguousarray(arr)
        return name

    def const(self, arr: np.ndarray, hint: str = "Constant") -> str:
        name = f"/model.22/{hint}_{self._n}"
        self._n += 1
        return self.init(name, arr)

    def add(self, op, inputs, n_out=1, name=None, outputs=None, **attrs):
        name = name or f"/{op}_{self._n}"
        self._n += 1
        outs = outputs or [f"{name}_output_{i}" for i in range(n_out)]
        self.nodes.append(node_proto(op, inputs, outs, name, **attrs))
        return outs[0] if n_out == 1 and outputs is None else outs


def _fuse(pnode, snode, eps: float = 1e-3):
    """ConvBnSiLU flax params -> fused torch-layout (weight [O,I,kh,kw],
    bias [O]), as the Ultralytics export's fuse_conv_and_bn does."""
    kernel = np.asarray(pnode["conv"]["kernel"], np.float64)  # [kh,kw,I,O]
    scale = np.asarray(pnode["bn"]["scale"], np.float64)
    bias = np.asarray(pnode["bn"]["bias"], np.float64)
    mean = np.asarray(snode["bn"]["mean"], np.float64)
    var = np.asarray(snode["bn"]["var"], np.float64)
    g = scale / np.sqrt(var + eps)
    w = (kernel * g).transpose(3, 2, 0, 1)  # -> [O, I, kh, kw]
    b = bias - mean * g
    return w.astype(np.float32), b.astype(np.float32)


def _conv_silu(g, x, tname, pnode, snode, k, s):
    w, b = _fuse(pnode, snode)
    wn = g.init(f"{tname}.conv.weight", w)
    bn = g.init(f"{tname}.conv.bias", b)
    p = k // 2
    y = g.add(
        "Conv",
        [x, wn, bn],
        name=f"/{tname}/conv/Conv",
        dilations=[1, 1],
        group=1,
        kernel_shape=[k, k],
        pads=[p, p, p, p],
        strides=[s, s],
    )
    sig = g.add("Sigmoid", [y], name=f"/{tname}/act/Sigmoid")
    return g.add("Mul", [y, sig], name=f"/{tname}/act/Mul")


def _c2f(g, x, tname, pnode, snode, shortcut):
    y = _conv_silu(g, x, f"{tname}.cv1", pnode["cv1"], snode["cv1"], 1, 1)
    c2 = int(np.asarray(pnode["cv1"]["conv"]["kernel"]).shape[-1])
    c = c2 // 2
    split = g.const(np.asarray([c, c], np.int64), hint=f"{tname}.split".replace(".", "_"))
    s0, s1 = g.add(
        "Split", [y, split], n_out=2, name=f"/{tname}/Split", axis=1
    )
    parts = [s0, s1]
    prev = s1
    i = 0
    while f"m{i}" in pnode:
        b1 = _conv_silu(
            g, prev, f"{tname}.m.{i}.cv1", pnode[f"m{i}"]["cv1"],
            snode[f"m{i}"]["cv1"], 3, 1,
        )
        b2 = _conv_silu(
            g, b1, f"{tname}.m.{i}.cv2", pnode[f"m{i}"]["cv2"],
            snode[f"m{i}"]["cv2"], 3, 1,
        )
        cur = (
            g.add("Add", [prev, b2], name=f"/{tname}/m.{i}/Add")
            if shortcut
            else b2
        )
        parts.append(cur)
        prev = cur
        i += 1
    cat = g.add("Concat", parts, name=f"/{tname}/Concat", axis=1)
    return _conv_silu(g, cat, f"{tname}.cv2", pnode["cv2"], snode["cv2"], 1, 1)


def _sppf(g, x, tname, pnode, snode):
    y = _conv_silu(g, x, f"{tname}.cv1", pnode["cv1"], snode["cv1"], 1, 1)
    pools = [y]
    for i in range(3):
        pools.append(
            g.add(
                "MaxPool",
                [pools[-1]],
                name=f"/{tname}/m_{i}/MaxPool",
                ceil_mode=0,
                kernel_shape=[5, 5],
                pads=[2, 2, 2, 2],
                strides=[1, 1],
            )
        )
    cat = g.add("Concat", pools, name=f"/{tname}/Concat", axis=1)
    return _conv_silu(g, cat, f"{tname}.cv2", pnode["cv2"], snode["cv2"], 1, 1)


def _upsample(g, x, tname):
    scales = g.const(np.asarray([1.0, 1.0, 2.0, 2.0], np.float32),
                     hint=f"{tname}.scales".replace(".", "_"))
    return g.add(
        "Resize",
        [x, "", scales],
        name=f"/{tname}/Resize",
        coordinate_transformation_mode="asymmetric",
        mode="nearest",
        nearest_mode="floor",
    )


def _anchors_strides(input_size, strides=(8, 16, 32)):
    pts, strd = [], []
    h, w = input_size
    for s in strides:
        gh, gw = h // s, w // s
        ys, xs = np.meshgrid(
            np.arange(gh, dtype=np.float32) + 0.5,
            np.arange(gw, dtype=np.float32) + 0.5,
            indexing="ij",
        )
        pts.append(np.stack([xs.reshape(-1), ys.reshape(-1)], axis=0))
        strd.append(np.full((gh * gw,), float(s), np.float32))
    return np.concatenate(pts, axis=1), np.concatenate(strd)[None]


def build_model_bytes(
    variables, num_classes: int, input_size=(640, 640), reg_max: int = 16
) -> bytes:
    """Flax variables (standard k3/s2 stem) -> serialized ONNX ModelProto."""
    params = variables["params"]
    stats = variables["batch_stats"]
    bb_p, bb_s = params["backbone"], stats["backbone"]
    nk_p, nk_s = params["neck"], stats["neck"]
    hd_p, hd_s = params["head"], stats["head"]
    g = GraphBuilder()

    x = _conv_silu(g, "images", "model.0", bb_p["stem"], bb_s["stem"], 3, 2)
    x = _conv_silu(g, x, "model.1", bb_p["down2"], bb_s["down2"], 3, 2)
    x = _c2f(g, x, "model.2", bb_p["c2f_2"], bb_s["c2f_2"], True)
    x = _conv_silu(g, x, "model.3", bb_p["down3"], bb_s["down3"], 3, 2)
    p3 = _c2f(g, x, "model.4", bb_p["c2f_3"], bb_s["c2f_3"], True)
    x = _conv_silu(g, p3, "model.5", bb_p["down4"], bb_s["down4"], 3, 2)
    p4 = _c2f(g, x, "model.6", bb_p["c2f_4"], bb_s["c2f_4"], True)
    x = _conv_silu(g, p4, "model.7", bb_p["down5"], bb_s["down5"], 3, 2)
    x = _c2f(g, x, "model.8", bb_p["c2f_5"], bb_s["c2f_5"], True)
    p5 = _sppf(g, x, "model.9", bb_p["sppf"], bb_s["sppf"])

    up = _upsample(g, p5, "model.10")
    x = g.add("Concat", [up, p4], name="/model.11/Concat", axis=1)
    t1 = _c2f(g, x, "model.12", nk_p["up_c2f_4"], nk_s["up_c2f_4"], False)
    up = _upsample(g, t1, "model.13")
    x = g.add("Concat", [up, p3], name="/model.14/Concat", axis=1)
    n3 = _c2f(g, x, "model.15", nk_p["up_c2f_3"], nk_s["up_c2f_3"], False)
    x = _conv_silu(
        g, n3, "model.16", nk_p["down_conv_3"], nk_s["down_conv_3"], 3, 2
    )
    x = g.add("Concat", [x, t1], name="/model.17/Concat", axis=1)
    n4 = _c2f(g, x, "model.18", nk_p["down_c2f_4"], nk_s["down_c2f_4"], False)
    x = _conv_silu(
        g, n4, "model.19", nk_p["down_conv_4"], nk_s["down_conv_4"], 3, 2
    )
    x = g.add("Concat", [x, p5], name="/model.20/Concat", axis=1)
    n5 = _c2f(g, x, "model.21", nk_p["down_c2f_5"], nk_s["down_c2f_5"], False)

    # Detect head (model.22): per scale, box branch cv2.{i} and class branch
    # cv3.{i}; then the export-style decode with baked anchors/strides.
    no = 4 * reg_max + num_classes
    scale_outs = []
    for i, f in enumerate((n3, n4, n5)):
        box = _conv_silu(
            g, f, f"model.22.cv2.{i}.0", hd_p[f"box{i}_0"], hd_s[f"box{i}_0"],
            3, 1,
        )
        box = _conv_silu(
            g, box, f"model.22.cv2.{i}.1", hd_p[f"box{i}_1"],
            hd_s[f"box{i}_1"], 3, 1,
        )
        wn = g.init(
            f"model.22.cv2.{i}.2.weight",
            np.asarray(hd_p[f"box{i}_2"]["kernel"], np.float32).transpose(
                3, 2, 0, 1
            ),
        )
        bn = g.init(
            f"model.22.cv2.{i}.2.bias",
            np.asarray(hd_p[f"box{i}_2"]["bias"], np.float32),
        )
        box = g.add(
            "Conv",
            [box, wn, bn],
            name=f"/model.22/cv2.{i}/cv2.{i}.2/Conv",
            dilations=[1, 1],
            group=1,
            kernel_shape=[1, 1],
            pads=[0, 0, 0, 0],
            strides=[1, 1],
        )
        cls = _conv_silu(
            g, f, f"model.22.cv3.{i}.0", hd_p[f"cls{i}_0"], hd_s[f"cls{i}_0"],
            3, 1,
        )
        cls = _conv_silu(
            g, cls, f"model.22.cv3.{i}.1", hd_p[f"cls{i}_1"],
            hd_s[f"cls{i}_1"], 3, 1,
        )
        wn = g.init(
            f"model.22.cv3.{i}.2.weight",
            np.asarray(hd_p[f"cls{i}_2"]["kernel"], np.float32).transpose(
                3, 2, 0, 1
            ),
        )
        bn = g.init(
            f"model.22.cv3.{i}.2.bias",
            np.asarray(hd_p[f"cls{i}_2"]["bias"], np.float32),
        )
        cls = g.add(
            "Conv",
            [cls, wn, bn],
            name=f"/model.22/cv3.{i}/cv3.{i}.2/Conv",
            dilations=[1, 1],
            group=1,
            kernel_shape=[1, 1],
            pads=[0, 0, 0, 0],
            strides=[1, 1],
        )
        cat = g.add(
            "Concat", [box, cls], name=f"/model.22/Concat_{i}", axis=1
        )
        shp = g.const(np.asarray([1, no, -1], np.int64), hint=f"view{i}")
        scale_outs.append(
            g.add("Reshape", [cat, shp], name=f"/model.22/Reshape_{i}")
        )
    allcat = g.add(
        "Concat", scale_outs, name="/model.22/Concat_all", axis=2
    )
    split = g.const(np.asarray([4 * reg_max, num_classes], np.int64),
                    hint="boxcls_split")
    box_dist, cls_logits = g.add(
        "Split", [allcat, split], n_out=2, name="/model.22/Split", axis=1
    )

    # DFL (model.22.dfl): softmax expectation over reg_max bins.
    a_total = sum(
        (input_size[0] // s) * (input_size[1] // s) for s in (8, 16, 32)
    )
    shp = g.const(np.asarray([1, 4, reg_max, a_total], np.int64), hint="dflv")
    y = g.add("Reshape", [box_dist, shp], name="/model.22/dfl/Reshape")
    y = g.add(
        "Transpose", [y], name="/model.22/dfl/Transpose", perm=[0, 2, 1, 3]
    )
    y = g.add("Softmax", [y], name="/model.22/dfl/Softmax", axis=1)
    dflw = g.init(
        "model.22.dfl.conv.weight",
        np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1),
    )
    y = g.add(
        "Conv",
        [y, dflw],
        name="/model.22/dfl/conv/Conv",
        dilations=[1, 1],
        group=1,
        kernel_shape=[1, 1],
        pads=[0, 0, 0, 0],
        strides=[1, 1],
    )
    shp = g.const(np.asarray([1, 4, a_total], np.int64), hint="dflo")
    dist = g.add("Reshape", [y, shp], name="/model.22/dfl/Reshape_1")

    anchors, strides_row = _anchors_strides(input_size)
    anc = g.const(anchors.astype(np.float32), hint="anchors")
    strd = g.const(strides_row.astype(np.float32), hint="strides")
    z = g.const(np.asarray([0], np.int64), hint="sl0")
    two = g.const(np.asarray([2], np.int64), hint="sl2")
    four = g.const(np.asarray([4], np.int64), hint="sl4")
    ax1 = g.const(np.asarray([1], np.int64), hint="ax1")
    lt = g.add("Slice", [dist, z, two, ax1], name="/model.22/Slice")
    rb = g.add("Slice", [dist, two, four, ax1], name="/model.22/Slice_1")
    x1y1 = g.add("Sub", [anc, lt], name="/model.22/Sub")
    x2y2 = g.add("Add", [anc, rb], name="/model.22/Add")
    csum = g.add("Add", [x1y1, x2y2], name="/model.22/Add_1")
    half = g.const(np.asarray(2.0, np.float32), hint="half")
    cxy = g.add("Div", [csum, half], name="/model.22/Div")
    wh = g.add("Sub", [x2y2, x1y1], name="/model.22/Sub_1")
    boxcat = g.add("Concat", [cxy, wh], name="/model.22/Concat_box", axis=1)
    box = g.add("Mul", [boxcat, strd], name="/model.22/Mul_box")
    scores = g.add("Sigmoid", [cls_logits], name="/model.22/Sigmoid")
    g.add(
        "Concat",
        [box, scores],
        name="/model.22/Concat_out",
        axis=1,
        outputs=["output0"],
    )

    graph = b"".join(_lfield(1, n) for n in g.nodes)
    graph += _sfield(2, "main_graph")
    graph += b"".join(
        _lfield(5, tensor_proto(n, a)) for n, a in g.inits.items()
    )
    graph += _lfield(
        11, value_info("images", 1, (1, 3, input_size[0], input_size[1]))
    )
    graph += _lfield(
        12, value_info("output0", 1, (1, 4 + num_classes, a_total))
    )

    model = _vfield(1, 8)  # ir_version
    model += _sfield(2, "rm_radar_tpu")  # producer_name
    model += _sfield(3, "1.0")
    model += _lfield(7, graph)
    model += _lfield(8, _sfield(1, "") + _vfield(2, 17))  # opset 17
    return model


def export_onnx(
    npz_path: str, out_path: str, num_classes: int, input_size=(640, 640)
) -> float:
    """Returns the stem projection residual fraction (0.0 for standard)."""
    from rm_radar_tpu.models.weights import (
        load_variables,
        stem_kernel_from_s2d,
    )

    variables = load_variables(npz_path)
    stem = variables["params"]["backbone"]["stem"]["conv"]["kernel"]
    resid = 0.0
    if np.asarray(stem).shape[:2] == (2, 2):
        k3, resid = stem_kernel_from_s2d(stem)
        variables["params"]["backbone"]["stem"]["conv"]["kernel"] = k3
    data = build_model_bytes(variables, num_classes, input_size)
    with open(out_path, "wb") as f:
        f.write(data)
    return resid


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("out")
    ap.add_argument("--classes", type=int, required=True)
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()
    resid = export_onnx(
        args.npz, args.out, args.classes, (args.size, args.size)
    )
    size = os.path.getsize(args.out)
    print(
        f"wrote {args.out} ({size / 1e6:.2f} MB); stem s2d->k3 projection "
        f"residual: {resid:.4f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
