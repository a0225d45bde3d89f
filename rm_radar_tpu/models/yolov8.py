"""YOLOv8 detection model in Flax (linen), TPU-native.

The reference consumes Ultralytics YOLOv8 ONNX exports through TensorRT
(reference src/detect/detector.cpp:177-243 builds an FP16 engine from
car.onnx / armor.onnx; doc/识别优化.md documents yolov8n/s/m usage). Here the
network is implemented natively in JAX so XLA compiles it straight onto the
MXU: NHWC layout, bfloat16 compute with float32 parameters by default, static
shapes, no engine files — the jit cache plus JAX's persistent compilation
cache play the role of the serialized TensorRT engine.

Topology matches Ultralytics v8 (CSP backbone with C2f blocks + SPPF, PAN-FPN
neck, decoupled anchor-free head with DFL box regression), so official
checkpoints can be converted 1:1 (see tools/convert_weights.py). The exported
"raw output" layout matches the ONNX export consumed by the reference:
``[batch, 4 + num_classes, num_anchors]`` with xywh in input pixels and
sigmoid class scores (reference detector.cpp:129-130 reads those dims;
doc/识别优化.md:21 documents 84 = 4 + 80 channels for yolov8n).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

# depth_multiple, width_multiple, ratio (last-stage channel ratio)
VARIANTS = {
    "n": (1 / 3, 0.25, 2.0),
    "s": (1 / 3, 0.50, 2.0),
    "m": (2 / 3, 0.75, 1.5),
    "l": (1.0, 1.00, 1.0),
    "x": (1.0, 1.25, 1.0),
}

STRIDES = (8, 16, 32)


def _ch(width: float, base: int, ratio: float = 1.0) -> int:
    """Scaled channel count, rounded to a multiple of 8 like Ultralytics."""
    return int(math.ceil(base * width * ratio / 8) * 8)


def _depth(depth: float, n: int) -> int:
    return max(round(n * depth), 1)


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    """Model hyperparameters; ``variant`` picks the published n/s/m/l/x size."""

    variant: str = "m"
    num_classes: int = 1
    reg_max: int = 16
    input_size: Tuple[int, int] = (640, 640)
    # Space-to-depth stem: the k3/s2 stem conv on 3-channel input is
    # feature-pack-starved on the MXU (measured 7x slower than the exact
    # equivalent k2/s1 conv on the 2x2-space-to-depth input). Numerically
    # identical; checkpoints with a standard stem are adapted on load
    # (models/weights.py::adapt_stem_to_s2d).
    s2d_stem: bool = True  # (H, W)

    @property
    def scales(self) -> Tuple[float, float, float]:
        return VARIANTS[self.variant]

    @property
    def num_anchors(self) -> int:
        h, w = self.input_size
        return sum((h // s) * (w // s) for s in STRIDES)

    @property
    def num_outputs(self) -> int:
        return 4 + self.num_classes


def space_to_depth(x: Array) -> Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with (p, q, c) channel order.

    The reshape/transpose formulation costs a ~1.9 ms layout-copy chain at
    [8, 640, 640, 3] on v5e, but the measured alternative (four stride-2
    slices + channel concat) is worse (+4.8 ms end-to-end) — strided slices
    tile poorly. Kept as reshape/transpose; the long-term fix is emitting
    the crop resample directly in s2d layout (PERF.md).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


class ConvBnSiLU(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU — the Ultralytics ``Conv`` block."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32
    padding: Any = None  # default: SAME-style k//2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = self.kernel // 2
        padding = self.padding if self.padding is not None else ((p, p), (p, p))
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """Two 3x3 convs with optional residual (Ultralytics Bottleneck, e=1.0)."""

    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (Ultralytics C2f)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.features // 2
        y = ConvBnSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, dtype=self.dtype, name=f"m{i}")(
                    parts[-1], train
                )
            )
        y = jnp.concatenate(parts, axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="cv2")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = x.shape[-1] // 2
        x = ConvBnSiLU(c, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (5, 5), strides=(1, 1), padding=((2, 2), (2, 2))
                )
            )
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="cv2")(x, train)


class Backbone(nn.Module):
    """CSPDarknet backbone; returns (P3, P4, P5) feature maps."""

    cfg: YoloConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False, pre_s2d: bool = False):
        d, w, r = self.cfg.scales
        dt = self.dtype
        if self.cfg.s2d_stem:
            if not pre_s2d:
                x = space_to_depth(x)
            x = ConvBnSiLU(
                _ch(w, 64),
                kernel=2,
                stride=1,
                padding=((1, 0), (1, 0)),
                dtype=dt,
                name="stem",
            )(x, train)
        else:
            assert not pre_s2d, "pre_s2d input requires s2d_stem=True"
            x = ConvBnSiLU(_ch(w, 64), 3, 2, dtype=dt, name="stem")(x, train)
        x = ConvBnSiLU(_ch(w, 128), 3, 2, dtype=dt, name="down2")(x, train)
        x = C2f(_ch(w, 128), _depth(d, 3), True, dtype=dt, name="c2f_2")(x, train)
        x = ConvBnSiLU(_ch(w, 256), 3, 2, dtype=dt, name="down3")(x, train)
        p3 = C2f(_ch(w, 256), _depth(d, 6), True, dtype=dt, name="c2f_3")(x, train)
        x = ConvBnSiLU(_ch(w, 512), 3, 2, dtype=dt, name="down4")(p3, train)
        p4 = C2f(_ch(w, 512), _depth(d, 6), True, dtype=dt, name="c2f_4")(x, train)
        x = ConvBnSiLU(_ch(w, 512, r), 3, 2, dtype=dt, name="down5")(p4, train)
        x = C2f(_ch(w, 512, r), _depth(d, 3), True, dtype=dt, name="c2f_5")(x, train)
        p5 = SPPF(_ch(w, 512, r), dtype=dt, name="sppf")(x, train)
        return p3, p4, p5


class Neck(nn.Module):
    """PAN-FPN neck: top-down then bottom-up feature fusion."""

    cfg: YoloConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        d, w, r = self.cfg.scales
        dt = self.dtype
        p3, p4, p5 = feats

        def upsample(x):
            b, h, ww, c = x.shape
            return jax.image.resize(x, (b, h * 2, ww * 2, c), "nearest")

        x = jnp.concatenate([upsample(p5), p4], axis=-1)
        t1 = C2f(_ch(w, 512), _depth(d, 3), False, dtype=dt, name="up_c2f_4")(x, train)
        x = jnp.concatenate([upsample(t1), p3], axis=-1)
        n3 = C2f(_ch(w, 256), _depth(d, 3), False, dtype=dt, name="up_c2f_3")(x, train)
        x = ConvBnSiLU(_ch(w, 256), 3, 2, dtype=dt, name="down_conv_3")(n3, train)
        x = jnp.concatenate([x, t1], axis=-1)
        n4 = C2f(_ch(w, 512), _depth(d, 3), False, dtype=dt, name="down_c2f_4")(x, train)
        x = ConvBnSiLU(_ch(w, 512), 3, 2, dtype=dt, name="down_conv_4")(n4, train)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = C2f(_ch(w, 512, r), _depth(d, 3), False, dtype=dt, name="down_c2f_5")(x, train)
        return n3, n4, n5


class DetectHead(nn.Module):
    """Decoupled anchor-free head with DFL box regression.

    Per scale: a box branch emitting 4*reg_max distribution logits and a
    class branch emitting num_classes logits. Raw per-scale maps are returned;
    decoding to the ONNX-style [B, 4+nc, A] output happens in
    :func:`decode_predictions` (kept separate so the training loss can
    consume the raw distributions).
    """

    cfg: YoloConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        d, w, r = self.cfg.scales
        nc = self.cfg.num_classes
        reg = self.cfg.reg_max
        ch0 = _ch(w, 256)  # P3 channel count
        c2 = max(16, ch0 // 4, reg * 4)
        c3 = max(ch0, min(nc, 100))
        outs = []
        for i, f in enumerate(feats):
            box = ConvBnSiLU(c2, 3, dtype=self.dtype, name=f"box{i}_0")(f, train)
            box = ConvBnSiLU(c2, 3, dtype=self.dtype, name=f"box{i}_1")(box, train)
            box = nn.Conv(4 * reg, (1, 1), dtype=self.dtype, name=f"box{i}_2")(box)
            cls = ConvBnSiLU(c3, 3, dtype=self.dtype, name=f"cls{i}_0")(f, train)
            cls = ConvBnSiLU(c3, 3, dtype=self.dtype, name=f"cls{i}_1")(cls, train)
            cls = nn.Conv(nc, (1, 1), dtype=self.dtype, name=f"cls{i}_2")(cls)
            outs.append((box, cls))
        return outs


class YoloV8(nn.Module):
    """Full detector. ``__call__`` returns the ONNX-export-style tensor
    [B, 4 + nc, A]; ``raw`` returns per-scale head outputs for training."""

    cfg: YoloConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = Backbone(self.cfg, dtype=self.dtype)
        self.neck = Neck(self.cfg, dtype=self.dtype)
        self.head = DetectHead(self.cfg, dtype=self.dtype)

    def raw(self, x: Array, train: bool = False, pre_s2d: bool = False):
        """``pre_s2d=True`` accepts input already in space-to-depth layout
        ([B, H/2, W/2, 4C]); producers like the fused crop resample emit it
        directly, skipping the stem's transpose chain."""
        return self.head(
            self.neck(self.backbone(x, train, pre_s2d), train), train
        )

    def __call__(
        self, x: Array, train: bool = False, pre_s2d: bool = False
    ) -> Array:
        return decode_predictions(self.raw(x, train, pre_s2d), self.cfg)


def anchor_points(
    input_size: Tuple[int, int], strides: Sequence[int] = STRIDES
) -> Tuple[Array, Array]:
    """Grid-cell center points (in stride units, offset 0.5) and per-anchor
    stride, concatenated over scales. Returns ([A, 2], [A])."""
    pts, strd = [], []
    h, w = input_size
    for s in strides:
        gh, gw = h // s, w // s
        ys, xs = jnp.meshgrid(
            jnp.arange(gh, dtype=jnp.float32) + 0.5,
            jnp.arange(gw, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        pts.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
        strd.append(jnp.full((gh * gw,), float(s), jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strd)


def decode_predictions(raw_outputs, cfg: YoloConfig) -> Array:
    """Per-scale head maps -> ONNX-style [B, 4 + nc, A] tensor.

    DFL: softmax over reg_max bins, expectation -> (l, t, r, b) distances in
    stride units; box = (center - lt, center + rb) converted to
    (cx, cy, w, h) in input pixels; classes get a sigmoid. This matches the
    Ultralytics ONNX export graph the reference's TensorRT engine runs.
    """
    reg = cfg.reg_max
    boxes, scores = [], []
    for box_map, cls_map in raw_outputs:
        b, h, w, _ = box_map.shape
        boxes.append(box_map.reshape(b, h * w, 4, reg))
        scores.append(cls_map.reshape(b, h * w, cfg.num_classes))
    dist = jnp.concatenate(boxes, axis=1).astype(jnp.float32)  # [B, A, 4, reg]
    cls = jnp.concatenate(scores, axis=1).astype(jnp.float32)  # [B, A, nc]

    bins = jnp.arange(reg, dtype=jnp.float32)
    ltrb = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # [B, A, 4]

    points, strides_per_anchor = anchor_points(cfg.input_size)
    x1y1 = points[None] - ltrb[..., :2]
    x2y2 = points[None] + ltrb[..., 2:]
    cxcy = (x1y1 + x2y2) * 0.5 * strides_per_anchor[None, :, None]
    wh = (x2y2 - x1y1) * strides_per_anchor[None, :, None]

    out = jnp.concatenate([cxcy, wh, jax.nn.sigmoid(cls)], axis=-1)
    return jnp.transpose(out, (0, 2, 1))  # [B, 4 + nc, A]


def create_model(
    variant: str = "m",
    num_classes: int = 1,
    input_size: Tuple[int, int] = (640, 640),
    dtype: Any = jnp.float32,
) -> Tuple[YoloV8, YoloConfig]:
    cfg = YoloConfig(variant=variant, num_classes=num_classes, input_size=input_size)
    return YoloV8(cfg, dtype=dtype), cfg


def init_params(model: YoloV8, rng: jax.Array, batch: int = 1):
    """Initialize parameters (and batch stats) for the configured input size.

    Wrapped in jit: one compiled program instead of hundreds of eager ops
    (matters on remote-tunneled devices where each eager op is a compile).
    """
    h, w = model.cfg.input_size
    dummy = jnp.zeros((batch, h, w, 3), model.dtype)
    return jax.jit(model.init)(rng, dummy)
