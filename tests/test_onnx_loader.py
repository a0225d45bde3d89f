"""ONNX initializer reader tests: hand-encoded protobuf bytes (no onnx
package in the image) round-trip through the minimal wire-format parser,
and a fused (BN-folded) checkpoint maps onto the Flax tree via identity BN.
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_onnx import read_onnx_initializers, convert_onnx  # noqa: E402
from convert_weights import convert_state_dict  # noqa: E402


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload) -> bytes:
    tag = _varint(num << 3 | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    if wire == 0:
        return tag + _varint(payload)
    raise ValueError(wire)


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, d)
    msg += _field(2, 0, 1)  # FLOAT
    msg += _field(8, 2, name.encode())
    msg += _field(9, 2, arr.astype("<f4").tobytes())
    return msg


def _onnx_bytes(tensors: dict) -> bytes:
    graph = b"".join(
        _field(5, 2, _tensor_proto(name, arr)) for name, arr in tensors.items()
    )
    # Add an unrelated graph field (e.g. name) to ensure it is skipped.
    graph += _field(2, 2, b"main_graph")
    model = _field(1, 0, 8)  # ir_version
    model += _field(7, 2, graph)
    return model


def test_read_initializers_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "model.0.conv.weight": rng.normal(size=(16, 3, 3, 3)).astype(np.float32),
        "model.0.conv.bias": rng.normal(size=(16,)).astype(np.float32),
    }
    path = tmp_path / "tiny.onnx"
    path.write_bytes(_onnx_bytes(tensors))
    loaded = read_onnx_initializers(str(path))
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])


def test_fused_conv_bias_becomes_identity_bn(tmp_path):
    """A BN-folded export (conv carries a bias, no bn params) must map to
    conv kernel + identity BatchNorm carrying the bias, so that
    BN(conv(x)) == conv(x) + bias exactly (eps-compensated var)."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    path = tmp_path / "fused.onnx"
    path.write_bytes(
        _onnx_bytes({"model.0.conv.weight": w, "model.0.conv.bias": b})
    )
    tree = convert_onnx(str(path))
    stem_p = tree["params"]["backbone"]["stem"]
    stem_s = tree["batch_stats"]["backbone"]["stem"]
    assert stem_p["conv"]["kernel"].shape == (3, 3, 3, 16)
    np.testing.assert_array_equal(stem_p["bn"]["bias"], b)
    # identity check: scale/sqrt(var+eps) == 1, mean == 0
    eff = stem_p["bn"]["scale"] / np.sqrt(stem_s["bn"]["var"] + 1e-3)
    np.testing.assert_allclose(eff, 1.0, rtol=1e-6)
    np.testing.assert_array_equal(stem_s["bn"]["mean"], 0.0)


def test_unfused_checkpoint_keeps_real_bn():
    import pytest

    torch = pytest.importorskip("torch")
    sd = {
        "model.0.conv.weight": torch.zeros(16, 3, 3, 3),
        "model.0.bn.weight": torch.full((16,), 2.0),
        "model.0.bn.bias": torch.ones(16),
        "model.0.bn.running_mean": torch.zeros(16),
        "model.0.bn.running_var": torch.ones(16),
    }
    tree = convert_state_dict(sd)
    np.testing.assert_array_equal(
        tree["params"]["backbone"]["stem"]["bn"]["scale"], 2.0
    )
