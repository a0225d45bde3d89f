"""Detection decode + masked NMS, TPU-native.

The reference post-processes each image with three CUDA kernels: a tiled
transpose [C, A] -> [A, C] (detector.cu:185-203), a per-anchor decode
(argmax class, center-xywh -> corner-xywh, detector.cu:219-251) and a tiled
all-pairs class-aware NMS that marks suppressed boxes with label = NaN
(detector.cu:315-360), followed by a host-side NaN filter + coordinate
restore (detector.cu:561-579).

TPU design decisions:

* No transpose — the decode reduces over the channel axis of the raw
  [B, C, A] tensor directly (argmax/max over a minor axis is free for XLA).
* NMS runs all-pairs over only the top-K candidates by confidence instead of
  all 8400 anchors. This is exact: a suppressor must have strictly *higher*
  confidence than its victim (detector.cu:350), so nothing outside the top-K
  pool can suppress a pool member, and non-pool boxes only survive the
  reference NMS if they pass conf_thresh — i.e. only when more than K anchors
  pass the threshold, which does not happen for practical K (default 512 vs.
  the reference's worst case of ~dozens). Ties in confidence keep both boxes,
  like the reference.
* Instead of a NaN-label sentinel plus host filtering, survivors are
  compacted on device to a fixed ``max_detections`` capacity by a second
  top-k, and carried as a validity mask (types.Detections).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry import pairwise_iou, restore_boxes
from ..types import Array, Detections, PreParams


def decode(raw: Array) -> Tuple[Array, Array, Array]:
    """Raw model output [..., 4 + classes, A] -> (xywh [..., A, 4],
    label [..., A] int32, confidence [..., A]).

    Mirrors decodeKernel (detector.cu:219-251): label = argmax over class
    scores, x/y = center - extent/2 clamped at 0 (w/h deliberately not
    clamped), confidence = best class score.
    """
    boxes = raw[..., :4, :]
    scores = raw[..., 4:, :]
    label = jnp.argmax(scores, axis=-2).astype(jnp.int32)
    confidence = jnp.max(scores, axis=-2)
    cx, cy = boxes[..., 0, :], boxes[..., 1, :]
    w, h = boxes[..., 2, :], boxes[..., 3, :]
    x = jnp.maximum(cx - 0.5 * w, 0.0)
    y = jnp.maximum(cy - 0.5 * h, 0.0)
    xywh = jnp.stack([x, y, w, h], axis=-1)
    return xywh, label, confidence


def nms(
    xywh: Array,
    label: Array,
    confidence: Array,
    nms_thresh: float,
    conf_thresh: float,
    top_k: int = 512,
    max_detections: int = 32,
) -> Detections:
    """Class-aware all-pairs NMS over one image's anchors.

    A box dies if its confidence is below ``conf_thresh`` or some same-label
    box with strictly higher confidence overlaps it with IoU > ``nms_thresh``
    (NMSKernel semantics, detector.cu:341-357). Survivors are compacted to
    ``max_detections`` slots ordered by confidence.
    """
    num_anchors = xywh.shape[-2]
    k = min(top_k, num_anchors)

    top_conf, top_idx = jax.lax.top_k(confidence, k)
    top_boxes = jnp.take_along_axis(xywh, top_idx[..., None], axis=-2)
    top_label = jnp.take_along_axis(label, top_idx, axis=-1)

    iou = pairwise_iou(top_boxes, top_boxes)  # [..., k, k]
    same_label = top_label[..., :, None] == top_label[..., None, :]
    higher_conf = top_conf[..., None, :] > top_conf[..., :, None]
    suppressed = jnp.any(
        same_label & higher_conf & (iou > nms_thresh), axis=-1
    )
    keep = (top_conf >= conf_thresh) & ~suppressed

    # Compact to max_detections by confidence (keep-masked).
    order_score = jnp.where(keep, top_conf, -jnp.inf)
    m = min(max_detections, k)
    best_score, best = jax.lax.top_k(order_score, m)
    out_boxes = jnp.take_along_axis(top_boxes, best[..., None], axis=-2)
    out_label = jnp.take_along_axis(top_label, best, axis=-1)
    out_conf = jnp.take_along_axis(top_conf, best, axis=-1)
    valid = jnp.isfinite(best_score)
    return Detections(
        xywh=out_boxes,
        label=jnp.where(valid, out_label, -1),
        confidence=jnp.where(valid, out_conf, 0.0),
        valid=valid,
    )


def postprocess(
    raw: Array,
    pparam: PreParams,
    nms_thresh: float,
    conf_thresh: float,
    top_k: int = 512,
    max_detections: int = 32,
    with_candidate_count: bool = False,
):
    """decode -> NMS -> restore to source-image coordinates, one fused jit
    region per image (batch via vmap). Equivalent to Detector::postprocess
    (detector.cu:522-582) + restoreDetection (detector.cpp:258-268).

    ``with_candidate_count=True`` additionally returns the per-image count
    of anchors whose best class score passes ``conf_thresh`` — the exact
    population the reference's all-pairs NMS runs over (detector.cu:315-360).
    The top-K pool here is exact only while that count stays <= ``top_k``;
    the count makes the saturation regime observable (telemetry in
    RobotBatch.nms_candidates_* and the bench) instead of silently
    approximate.
    """
    xywh, label, conf = decode(raw)
    dets = nms(
        xywh, label, conf, nms_thresh, conf_thresh, top_k, max_detections
    )
    restored = restore_boxes(dets.xywh, pparam)
    dets = dets._replace(xywh=restored)
    if with_candidate_count:
        n_candidates = jnp.sum(
            (conf >= conf_thresh).astype(jnp.int32), axis=-1
        )
        return dets, n_candidates
    return dets
