"""Full-graph numerical parity: the Flax/XLA YOLOv8 forward vs an
independent numpy float64 re-evaluation of the same weights.

This is the TPU build's answer to the reference's 'ONNX-runtime CPU parity'
tier (SURVEY.md §4c): the oracle below is written from the architecture
definition alone (im2col-free shifted-slice convolutions, inference
batch-norm, the DFL decode), shares no code with rm_radar_tpu/models/yolov8.py,
and runs in float64 — so agreement certifies both the graph wiring and the
numerics of the compiled program, independent of XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rm_radar_tpu.models.yolov8 import VARIANTS, create_model, init_params

EPS = 1e-3  # flax BatchNorm epsilon used by the model


# --------------------------------------------------------------- numpy ops
def conv2d(x, kernel, stride=1, padding=None, bias=None):
    """NHWC x HWIO convolution via shifted-slice accumulation (float64)."""
    kh, kw, ci, co = kernel.shape
    if padding is None:
        p = kh // 2
        padding = ((p, p), (p, p))
    x = np.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    b, h, w, _ = x.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    out = np.zeros((b, oh, ow, co), np.float64)
    for i in range(kh):
        for j in range(kw):
            xs = x[:, i : i + oh * stride : stride, j : j + ow * stride : stride]
            out += np.einsum("bhwc,cd->bhwd", xs, kernel[i, j])
    if bias is not None:
        out += bias
    return out


def batchnorm(x, bn_params, bn_stats):
    return (x - bn_stats["mean"]) / np.sqrt(bn_stats["var"] + EPS) * bn_params[
        "scale"
    ] + bn_params["bias"]


def silu(x):
    return x / (1.0 + np.exp(-x))


def conv_bn_silu(x, params, stats, stride=1, padding=None):
    y = conv2d(
        x, np.asarray(params["conv"]["kernel"], np.float64), stride, padding
    )
    return silu(batchnorm(y, params["bn"], stats["bn"]))


def bottleneck(x, params, stats, shortcut):
    y = conv_bn_silu(x, params["cv1"], stats["cv1"])
    y = conv_bn_silu(y, params["cv2"], stats["cv2"])
    return x + y if shortcut else y


def c2f(x, params, stats, n, shortcut):
    y = conv_bn_silu(x, params["cv1"], stats["cv1"])
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for i in range(n):
        parts.append(
            bottleneck(parts[-1], params[f"m{i}"], stats[f"m{i}"], shortcut)
        )
    return conv_bn_silu(np.concatenate(parts, -1), params["cv2"], stats["cv2"])


def maxpool5(x):
    xp = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), constant_values=-np.inf)
    b, h, w, c = x.shape
    out = np.full_like(x, -np.inf)
    for i in range(5):
        for j in range(5):
            out = np.maximum(out, xp[:, i : i + h, j : j + w])
    return out


def sppf(x, params, stats):
    x = conv_bn_silu(x, params["cv1"], stats["cv1"])
    pools = [x]
    for _ in range(3):
        pools.append(maxpool5(pools[-1]))
    return conv_bn_silu(np.concatenate(pools, -1), params["cv2"], stats["cv2"])


def upsample2(x):
    return np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)


def space_to_depth_np(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _depth(d, n):
    return max(round(n * d), 1)


def yolo_forward_np(x, variables, cfg):
    """Independent float64 forward: [B, H, W, 3] -> [B, 4+nc, A]."""
    p = variables["params"]
    s = variables["batch_stats"]
    d, w, r = VARIANTS[cfg.variant]
    bp, bs = p["backbone"], s["backbone"]

    if cfg.s2d_stem:
        x = space_to_depth_np(x)
        x = conv_bn_silu(x, bp["stem"], bs["stem"], 1, ((1, 0), (1, 0)))
    else:
        x = conv_bn_silu(x, bp["stem"], bs["stem"], 2)
    x = conv_bn_silu(x, bp["down2"], bs["down2"], 2)
    x = c2f(x, bp["c2f_2"], bs["c2f_2"], _depth(d, 3), True)
    x = conv_bn_silu(x, bp["down3"], bs["down3"], 2)
    p3 = c2f(x, bp["c2f_3"], bs["c2f_3"], _depth(d, 6), True)
    x = conv_bn_silu(p3, bp["down4"], bs["down4"], 2)
    p4 = c2f(x, bp["c2f_4"], bs["c2f_4"], _depth(d, 6), True)
    x = conv_bn_silu(p4, bp["down5"], bs["down5"], 2)
    x = c2f(x, bp["c2f_5"], bs["c2f_5"], _depth(d, 3), True)
    p5 = sppf(x, bp["sppf"], bs["sppf"])

    npk, ns = p["neck"], s["neck"]
    x = np.concatenate([upsample2(p5), p4], -1)
    t1 = c2f(x, npk["up_c2f_4"], ns["up_c2f_4"], _depth(d, 3), False)
    x = np.concatenate([upsample2(t1), p3], -1)
    n3 = c2f(x, npk["up_c2f_3"], ns["up_c2f_3"], _depth(d, 3), False)
    x = conv_bn_silu(n3, npk["down_conv_3"], ns["down_conv_3"], 2)
    x = np.concatenate([x, t1], -1)
    n4 = c2f(x, npk["down_c2f_4"], ns["down_c2f_4"], _depth(d, 3), False)
    x = conv_bn_silu(n4, npk["down_conv_4"], ns["down_conv_4"], 2)
    x = np.concatenate([x, p5], -1)
    n5 = c2f(x, npk["down_c2f_5"], ns["down_c2f_5"], _depth(d, 3), False)

    hp, hs = p["head"], s["head"]
    reg, nc = cfg.reg_max, cfg.num_classes
    dists, clss = [], []
    for i, f in enumerate((n3, n4, n5)):
        box = conv_bn_silu(f, hp[f"box{i}_0"], hs[f"box{i}_0"])
        box = conv_bn_silu(box, hp[f"box{i}_1"], hs[f"box{i}_1"])
        box = conv2d(
            box,
            np.asarray(hp[f"box{i}_2"]["kernel"], np.float64),
            bias=np.asarray(hp[f"box{i}_2"]["bias"], np.float64),
        )
        cls = conv_bn_silu(f, hp[f"cls{i}_0"], hs[f"cls{i}_0"])
        cls = conv_bn_silu(cls, hp[f"cls{i}_1"], hs[f"cls{i}_1"])
        cls = conv2d(
            cls,
            np.asarray(hp[f"cls{i}_2"]["kernel"], np.float64),
            bias=np.asarray(hp[f"cls{i}_2"]["bias"], np.float64),
        )
        b, h, w_, _ = box.shape
        dists.append(box.reshape(b, h * w_, 4, reg))
        clss.append(cls.reshape(b, h * w_, nc))
    dist = np.concatenate(dists, 1)
    cls = np.concatenate(clss, 1)

    # DFL decode + anchor grid (independent re-derivation).
    e = np.exp(dist - dist.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    ltrb = (prob * np.arange(reg)).sum(-1)
    pts, strd = [], []
    hh, ww = cfg.input_size
    for st in (8, 16, 32):
        gh, gw = hh // st, ww // st
        ys, xs = np.meshgrid(
            np.arange(gh) + 0.5, np.arange(gw) + 0.5, indexing="ij"
        )
        pts.append(np.stack([xs.ravel(), ys.ravel()], -1))
        strd.append(np.full(gh * gw, float(st)))
    points = np.concatenate(pts)
    stride = np.concatenate(strd)
    x1y1 = points[None] - ltrb[..., :2]
    x2y2 = points[None] + ltrb[..., 2:]
    cxcy = (x1y1 + x2y2) * 0.5 * stride[None, :, None]
    wh = (x2y2 - x1y1) * stride[None, :, None]
    sig = 1.0 / (1.0 + np.exp(-cls))
    out = np.concatenate([cxcy, wh, sig], -1)
    return out.transpose(0, 2, 1)


@pytest.mark.slow
@pytest.mark.parametrize("s2d", [True, False])
def test_full_graph_parity_vs_numpy_oracle(s2d):
    size = 64
    model, cfg = create_model(
        variant="n", num_classes=3, input_size=(size, size), dtype=jnp.float32
    )
    if not s2d:
        import dataclasses

        cfg = dataclasses.replace(cfg, s2d_stem=False)
        from rm_radar_tpu.models.yolov8 import YoloV8

        model = YoloV8(cfg, dtype=jnp.float32)
    variables = init_params(model, jax.random.PRNGKey(3))

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=(2, size, size, 3))

    got = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(x, jnp.float32))
    )
    want = yolo_forward_np(
        x.astype(np.float64), jax.device_get(variables), cfg
    )
    assert got.shape == want.shape == (2, 4 + 3, cfg.num_anchors)
    # Boxes are in input pixels (magnitude ~size); scores in [0, 1].
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(got[:, 4:], want[:, 4:], rtol=2e-3, atol=2e-3)
