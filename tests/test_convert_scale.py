"""Converter-at-scale test: tools/convert_weights.py must map a COMPLETE
Ultralytics-shaped state dict (every tensor of a DetectionModel, ~300 keys)
onto the Flax tree 1:1 — exact key-set and shape equality against the
model's own init tree — and the fused-BN (ONNX-style) variant must produce
the same forward outputs as the unfused checkpoint.

The torch key list below is generated from an independent structural spec of
Ultralytics YOLOv8 (layer indices model.0..model.22, C2f/SPPF/Detect member
names), NOT from the converter's own tables, so a wrong mapping fails here.
Plays the role of the reference's real-checkpoint ingestion
(src/detect/detector.cpp:74-99) for a snapshot without the weight blobs.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rm_radar_tpu.models.weights import maybe_adapt_stem
from rm_radar_tpu.models.yolov8 import VARIANTS, YoloV8, YoloConfig, init_params

torch = pytest.importorskip("torch")

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import convert_state_dict  # noqa: E402


def _ultralytics_state_dict(variant: str, nc: int, rng, fused: bool = False):
    """Full torch state dict of ultralytics.nn.tasks.DetectionModel.

    fused=True emulates the ONNX-export path: BN folded into the conv, which
    then carries a bias (identical function given these values: scale=1,
    mean=0 BN folding is value-preserving for any weights, and we verify the
    forward outputs match the unfused conversion).
    """
    d, w, r = VARIANTS[variant]

    def ch(base, ratio=1.0):
        return int(math.ceil(base * w * ratio / 8) * 8)

    def dep(n):
        return max(round(n * d), 1)

    sd = {}

    def t(shape):
        return torch.from_numpy(
            rng.uniform(-0.5, 0.5, size=shape).astype(np.float32)
        )

    def conv_bn(prefix, cin, cout, k):
        if fused:
            sd[f"{prefix}.conv.weight"] = t((cout, cin, k, k))
            sd[f"{prefix}.conv.bias"] = t((cout,))
        else:
            sd[f"{prefix}.conv.weight"] = t((cout, cin, k, k))
            sd[f"{prefix}.bn.weight"] = t((cout,))
            sd[f"{prefix}.bn.bias"] = t((cout,))
            sd[f"{prefix}.bn.running_mean"] = t((cout,))
            sd[f"{prefix}.bn.running_var"] = torch.from_numpy(
                rng.uniform(0.5, 1.5, size=(cout,)).astype(np.float32)
            )
            sd[f"{prefix}.bn.num_batches_tracked"] = torch.zeros(
                (), dtype=torch.long
            )

    def c2f(prefix, cin, cout, n):
        c = cout // 2
        conv_bn(f"{prefix}.cv1", cin, 2 * c, 1)
        for j in range(n):
            conv_bn(f"{prefix}.m.{j}.cv1", c, c, 3)
            conv_bn(f"{prefix}.m.{j}.cv2", c, c, 3)
        conv_bn(f"{prefix}.cv2", (2 + n) * c, cout, 1)

    c1, c2_, c3, c4, c5 = ch(64), ch(128), ch(256), ch(512), ch(512, r)

    conv_bn("model.0", 3, c1, 3)
    conv_bn("model.1", c1, c2_, 3)
    c2f("model.2", c2_, c2_, dep(3))
    conv_bn("model.3", c2_, c3, 3)
    c2f("model.4", c3, c3, dep(6))
    conv_bn("model.5", c3, c4, 3)
    c2f("model.6", c4, c4, dep(6))
    conv_bn("model.7", c4, c5, 3)
    c2f("model.8", c5, c5, dep(3))
    # SPPF
    conv_bn("model.9.cv1", c5, c5 // 2, 1)
    conv_bn("model.9.cv2", 4 * (c5 // 2), c5, 1)
    # neck (10/13 Upsample, 11/14/17/20 Concat: no params)
    c2f("model.12", c5 + c4, c4, dep(3))
    c2f("model.15", c4 + c3, c3, dep(3))
    conv_bn("model.16", c3, c3, 3)
    c2f("model.18", c3 + c4, c4, dep(3))
    conv_bn("model.19", c4, c4, 3)
    c2f("model.21", c4 + c5, c5, dep(3))
    # Detect head
    reg = 16
    c2h = max(16, c3 // 4, reg * 4)
    c3h = max(c3, min(nc, 100))
    for i, cin in enumerate((c3, c4, c5)):
        conv_bn(f"model.22.cv2.{i}.0", cin, c2h, 3)
        conv_bn(f"model.22.cv2.{i}.1", c2h, c2h, 3)
        sd[f"model.22.cv2.{i}.2.weight"] = t((4 * reg, c2h, 1, 1))
        sd[f"model.22.cv2.{i}.2.bias"] = t((4 * reg,))
        conv_bn(f"model.22.cv3.{i}.0", cin, c3h, 3)
        conv_bn(f"model.22.cv3.{i}.1", c3h, c3h, 3)
        sd[f"model.22.cv3.{i}.2.weight"] = t((nc, c3h, 1, 1))
        sd[f"model.22.cv3.{i}.2.bias"] = t((nc,))
    sd["model.22.dfl.conv.weight"] = torch.from_numpy(
        np.arange(reg, dtype=np.float32).reshape(1, reg, 1, 1)
    )
    return sd


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v).shape
    return out


@pytest.mark.parametrize("variant,nc", [("n", 12), ("m", 1)])
def test_full_key_set_maps_exactly(variant, nc):
    rng = np.random.default_rng(0)
    sd = _ultralytics_state_dict(variant, nc, rng)
    variables = convert_state_dict(sd)

    cfg = YoloConfig(
        variant=variant, num_classes=nc, input_size=(64, 64), s2d_stem=False
    )
    model = YoloV8(cfg, dtype=jnp.float32)
    ref = jax.device_get(init_params(model, jax.random.PRNGKey(0)))

    got_p, want_p = _flat(variables["params"]), _flat(dict(ref["params"]))
    got_s, want_s = (
        _flat(variables["batch_stats"]),
        _flat(dict(ref["batch_stats"])),
    )
    assert got_p == want_p, (
        sorted(set(want_p) ^ set(got_p))
        or {k: (got_p[k], want_p[k]) for k in got_p if got_p[k] != want_p[k]}
    )
    assert got_s == want_s
    # Real scale: the full yolov8 tree is ~hundreds of tensors.
    assert len(got_p) + len(got_s) > 200


def test_fused_checkpoint_matches_unfused_forward():
    """ONNX-style fused checkpoints (BN folded into conv+bias) must produce
    the same outputs as the unfused form through the converter + the s2d
    stem adaptation (models/weights.py)."""
    rng = np.random.default_rng(1)
    sd = _ultralytics_state_dict("n", 3, rng)

    # Fold each BN into its conv (the standard deploy-time fusion).
    fused = {}
    eps = 1e-3
    for name, tensor in sd.items():
        if ".bn." in name or name.endswith("num_batches_tracked"):
            continue
        if name.endswith("conv.weight") and name[: -len(".conv.weight")] + ".bn.weight" in sd:
            prefix = name[: -len(".conv.weight")]
            wt = sd[name].numpy()
            scale = sd[f"{prefix}.bn.weight"].numpy()
            bias = sd[f"{prefix}.bn.bias"].numpy()
            mean = sd[f"{prefix}.bn.running_mean"].numpy()
            var = sd[f"{prefix}.bn.running_var"].numpy()
            s = scale / np.sqrt(var + eps)
            fused[name] = torch.from_numpy(wt * s[:, None, None, None])
            fused[prefix + ".conv.bias"] = torch.from_numpy(bias - mean * s)
        else:
            fused[name] = tensor

    v_unfused = convert_state_dict(sd)
    v_fused = convert_state_dict(fused)

    cfg = YoloConfig(variant="n", num_classes=3, input_size=(64, 64))
    model = YoloV8(cfg, dtype=jnp.float32)  # s2d stem: exercises adaptation
    v_unfused = maybe_adapt_stem(v_unfused, True)
    v_fused = maybe_adapt_stem(v_fused, True)

    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 64, 64, 3)), jnp.float32
    )
    out_a = np.asarray(jax.jit(model.apply)(v_unfused, x))
    out_b = np.asarray(jax.jit(model.apply)(v_fused, x))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-3, atol=5e-3)
