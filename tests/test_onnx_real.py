"""Genuine-artifact ONNX round trip: export -> full-size real-format file ->
ingest -> parity.

The reference's deployment input is a real Ultralytics ONNX export
(reference src/detect/detector.cpp:177-243). tools/export_onnx.py produces
one (full graph, BN folded into convs, standard initializer naming) from the
repo's own *trained* checkpoints; tools/convert_onnx.py ingests it back.
These tests close the loop at full yolov8n/640 scale — not a hand-built
minimal protobuf — and check parity of the ingested weights against both the
Flax forward and the independent numpy float64 oracle
(tests/test_numpy_parity.py)."""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

from rm_radar_tpu.models.weights import (  # noqa: E402
    load_variables,
    stem_kernel_from_s2d,
    stem_kernel_to_s2d,
)
from rm_radar_tpu.models.yolov8 import YoloConfig, YoloV8  # noqa: E402

NPZ = os.path.join(REPO, "assets", "models", "car_synth_n.npz")


def test_stem_projection_inverts_s2d_exactly():
    rng = np.random.default_rng(0)
    k3 = rng.normal(size=(3, 3, 3, 16)).astype(np.float32)
    w2 = stem_kernel_to_s2d(k3)
    back, resid = stem_kernel_from_s2d(w2)
    np.testing.assert_array_equal(back, k3)
    assert resid == 0.0


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from export_onnx import export_onnx

    out = str(tmp_path_factory.mktemp("onnx") / "car_n.onnx")
    resid = export_onnx(NPZ, out, num_classes=1, input_size=(640, 640))
    return out, resid


@pytest.mark.slow
def test_export_is_full_size_real_format(exported):
    from convert_onnx import read_onnx_initializers

    path, resid = exported
    # A real yolov8n export is megabytes, not a toy protobuf.
    assert os.path.getsize(path) > 2_000_000
    # The trained s2d stem has out-of-support taps; the projection must
    # report them (and they must be a minor share of the kernel energy).
    assert 0.0 < resid < 0.9
    tensors = read_onnx_initializers(path)
    weights = [n for n in tensors if n.endswith((".weight", ".bias"))]
    # Full initializer set with standard Ultralytics naming.
    assert len(weights) > 120, len(weights)
    assert tensors["model.0.conv.weight"].shape == (16, 3, 3, 3)  # OIHW
    assert tensors["model.0.conv.bias"].shape == (16,)  # BN folded in
    assert tensors["model.22.dfl.conv.weight"].shape == (1, 16, 1, 1)
    np.testing.assert_array_equal(
        tensors["model.22.dfl.conv.weight"].reshape(-1),
        np.arange(16, dtype=np.float32),
    )
    assert "model.22.cv2.2.2.weight" in tensors
    assert "model.22.cv3.2.2.bias" in tensors
    assert "model.4.m.1.cv2.conv.weight" in tensors  # C2f depth present
    # No BatchNorm initializers survive in a fused export.
    assert not any(".bn." in n for n in tensors)


def _standard_variables():
    variables = load_variables(NPZ)
    stem = variables["params"]["backbone"]["stem"]["conv"]["kernel"]
    k3, _ = stem_kernel_from_s2d(stem)
    variables["params"]["backbone"]["stem"]["conv"]["kernel"] = k3
    return variables


@pytest.mark.slow
def test_ingested_matches_flax_forward_full_size(exported):
    """convert_onnx on the exported file reproduces the source model's
    forward at full 640 scale (differences bounded by BN-fuse arithmetic)."""
    from convert_onnx import convert_onnx

    path, _ = exported
    var_in = convert_onnx(path)
    var_std = _standard_variables()

    cfg = YoloConfig(
        variant="n", num_classes=1, input_size=(640, 640), s2d_stem=False
    )
    model = YoloV8(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(1, 640, 640, 3)), jnp.float32
    )
    fwd = jax.jit(model.apply)
    got = np.asarray(fwd(jax.device_put(var_in), x))
    want = np.asarray(fwd(jax.device_put(var_std), x))
    assert got.shape == want.shape == (1, 5, cfg.num_anchors)
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=2e-3, atol=0.5)
    np.testing.assert_allclose(got[:, 4:], want[:, 4:], rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_ingested_matches_numpy_f64_oracle_full_size(exported):
    """The ingested weights, run through the independent float64 numpy
    oracle, agree with the compiled Flax forward of the same weights — the
    reference's ONNX-runtime-CPU parity tier at full size."""
    from convert_onnx import convert_onnx

    from test_numpy_parity import yolo_forward_np

    path, _ = exported
    var_in = convert_onnx(path)
    cfg = YoloConfig(
        variant="n", num_classes=1, input_size=(640, 640), s2d_stem=False
    )
    model = YoloV8(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.uniform(0.0, 1.0, size=(1, 640, 640, 3))
    got = np.asarray(
        jax.jit(model.apply)(
            jax.device_put(var_in), jnp.asarray(x, jnp.float32)
        )
    )
    want = yolo_forward_np(x.astype(np.float64), var_in, cfg)
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=2e-3, atol=0.2)
    np.testing.assert_allclose(got[:, 4:], want[:, 4:], rtol=2e-3, atol=2e-3)
