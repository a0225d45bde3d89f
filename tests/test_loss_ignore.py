"""Ignore-region (iscrowd) masking in the detection loss.

The real-frame annotations (assets/labels/real_frames.json) mark one
ambiguous robot cluster per frame as ignore. Round-5 measurement: with
tiles containing the cluster unsampleable, the arena's central structure
next to it drew stable 0.96-confidence false positives (PERF.md). The fix
is the standard crowd convention — anchors inside an ignore box that are
not assigned to a real gt contribute ZERO classification loss — which
makes those windows trainable as (masked) background.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rm_radar_tpu.models.yolov8 import YoloConfig, anchor_points
from rm_radar_tpu.train.loss import DetectionTargets, detection_loss

CFG = YoloConfig(variant="n", num_classes=1, input_size=(32, 32))


def _raw(rng, b=1):
    """Fabricated per-scale head maps for a 32x32 input (scales 4/2/1)."""
    out = []
    for s in (8, 16, 32):
        h = w = 32 // s
        out.append(
            (
                jnp.asarray(
                    rng.normal(size=(b, h, w, 4 * CFG.reg_max)), jnp.float32
                ),
                jnp.asarray(
                    rng.normal(size=(b, h, w, CFG.num_classes)), jnp.float32
                ),
            )
        )
    return out


def _targets(xywh, valid, ignore=None):
    g = len(valid)
    t = DetectionTargets(
        xywh=jnp.asarray(np.asarray(xywh, np.float32).reshape(1, g, 4)),
        label=jnp.zeros((1, g), jnp.int32),
        valid=jnp.asarray(np.asarray(valid, bool).reshape(1, g)),
    )
    if ignore is not None:
        t = t._replace(
            ignore_xywh=jnp.asarray(
                np.asarray(ignore, np.float32).reshape(1, -1, 4)
            ),
            ignore_valid=jnp.ones((1, len(ignore)), bool),
        )
    return t


def test_ignore_region_zeroes_negative_cls_loss():
    rng = np.random.default_rng(0)
    raw = _raw(rng)
    none = _targets([[0, 0, 0, 0]], [False])
    # Ignore box covering the whole image: every (negative) anchor masked.
    all_ign = _targets(
        [[0, 0, 0, 0]], [False], ignore=[[0.0, 0.0, 32.0, 32.0]]
    )
    _, m_none = detection_loss(raw, none, CFG)
    _, m_all = detection_loss(raw, all_ign, CFG)
    assert float(m_none["cls_loss"]) > 0.0
    assert float(m_all["cls_loss"]) == 0.0


def test_ignore_region_partial_mask_is_monotone():
    rng = np.random.default_rng(1)
    raw = _raw(rng)
    none = _targets([[0, 0, 0, 0]], [False])
    part = _targets(
        [[0, 0, 0, 0]], [False], ignore=[[0.0, 0.0, 16.0, 32.0]]
    )
    _, m_none = detection_loss(raw, none, CFG)
    _, m_part = detection_loss(raw, part, CFG)
    assert 0.0 < float(m_part["cls_loss"]) < float(m_none["cls_loss"])


def test_positive_anchors_keep_loss_inside_ignore():
    """A real gt overlapping an ignore region still trains: its positive
    anchors keep cls/box loss even though their centers are in the box."""
    rng = np.random.default_rng(2)
    raw = _raw(rng)
    gt = [[8.0, 8.0, 16.0, 16.0]]
    with_ign = _targets(gt, [True], ignore=[[0.0, 0.0, 32.0, 32.0]])
    without = _targets(gt, [True])
    _, m_i = detection_loss(raw, with_ign, CFG)
    _, m_o = detection_loss(raw, without, CFG)
    assert float(m_i["num_positive"]) == float(m_o["num_positive"]) > 0
    assert float(m_i["box_loss"]) == float(m_o["box_loss"])
    assert float(m_i["cls_loss"]) > 0.0
    # The masked version drops only the ignore-region NEGATIVES' bce.
    assert float(m_i["cls_loss"]) <= float(m_o["cls_loss"])


def test_no_ignore_fields_is_unchanged():
    """Targets without ignore fields produce the exact pre-change loss
    (None fields short-circuit the masking)."""
    rng = np.random.default_rng(3)
    raw = _raw(rng)
    t = _targets([[4.0, 4.0, 12.0, 12.0]], [True])
    loss_a, _ = detection_loss(raw, t, CFG)
    loss_b, _ = detection_loss(raw, t, CFG)
    assert float(loss_a) == float(loss_b)
    assert np.isfinite(float(loss_a))
