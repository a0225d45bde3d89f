"""YOLOv8 detection loss for on-TPU training/fine-tuning.

The reference consumes weights trained offline by Ultralytics; this framework
additionally provides the training step natively so the detector can be
(re)trained on TPU pods. Loss composition follows YOLOv8: CIoU box loss +
distribution focal loss (DFL) on the regression bins + BCE classification,
with a center-based anchor assigner (a simplified stand-in for Ultralytics'
task-aligned assigner: anchors whose center falls inside a ground-truth box
are positives for that box, closest-center box winning conflicts).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.yolov8 import YoloConfig, anchor_points
from ..types import Array


class DetectionTargets(NamedTuple):
    """Ground truth per image: fixed-capacity boxes + labels + validity.

    ``ignore_xywh``/``ignore_valid`` (optional) mark crowd/ambiguous regions
    that must be neither positive nor negative: anchors whose center falls
    inside an ignore box and that are not assigned to a real gt get ZERO
    classification loss (the standard iscrowd convention). Without this,
    regions adjacent to an ambiguous cluster can never be sampled as
    background at all — the tile sampler would have to reject any window
    containing the cluster — and the model is free to hallucinate objects
    there (measured: the arena's central structure next to the one ignore
    region in assets/labels/real_frames.json drew stable 0.96-confidence
    false positives, PERF.md round-5 real-frame section).
    """

    xywh: Array  # [B, G, 4] (x, y, w, h) top-left, input pixels
    label: Array  # [B, G] int32
    valid: Array  # [B, G] bool
    ignore_xywh: Array | None = None  # [B, I, 4] or None
    ignore_valid: Array | None = None  # [B, I] bool


def _ciou(box_a: Array, box_b: Array) -> Array:
    """Complete IoU between xyxy boxes [..., 4]."""
    ax0, ay0, ax1, ay1 = (box_a[..., i] for i in range(4))
    bx0, by0, bx1, by1 = (box_b[..., i] for i in range(4))
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax1 - ax0, 0.0) * jnp.maximum(ay1 - ay0, 0.0)
    area_b = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)
    union = area_a + area_b - inter + 1e-7
    iou = inter / union
    # center distance / enclosing diagonal
    cx_a, cy_a = (ax0 + ax1) / 2, (ay0 + ay1) / 2
    cx_b, cy_b = (bx0 + bx1) / 2, (by0 + by1) / 2
    rho2 = (cx_a - cx_b) ** 2 + (cy_a - cy_b) ** 2
    ex0 = jnp.minimum(ax0, bx0)
    ey0 = jnp.minimum(ay0, by0)
    ex1 = jnp.maximum(ax1, bx1)
    ey1 = jnp.maximum(ay1, by1)
    c2 = (ex1 - ex0) ** 2 + (ey1 - ey0) ** 2 + 1e-7
    # aspect-ratio term
    wa = jnp.maximum(ax1 - ax0, 1e-7)
    ha = jnp.maximum(ay1 - ay0, 1e-7)
    wb = jnp.maximum(bx1 - bx0, 1e-7)
    hb = jnp.maximum(by1 - by0, 1e-7)
    v = (4 / jnp.pi**2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = v / (v - iou + 1 + 1e-7)
    return iou - rho2 / c2 - alpha * v


def _flatten_raw(raw_outputs, cfg: YoloConfig):
    """Per-scale head maps -> (dist_logits [B, A, 4, reg], cls_logits [B, A, nc])."""
    dists, clss = [], []
    for box_map, cls_map in raw_outputs:
        b, h, w, _ = box_map.shape
        dists.append(box_map.reshape(b, h * w, 4, cfg.reg_max))
        clss.append(cls_map.reshape(b, h * w, cfg.num_classes))
    return (
        jnp.concatenate(dists, axis=1).astype(jnp.float32),
        jnp.concatenate(clss, axis=1).astype(jnp.float32),
    )


def _decode_boxes(dist_logits, centers, strides, cfg: YoloConfig):
    """DFL logits -> predicted xyxy boxes in pixels [B, A, 4]."""
    bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
    ltrb = jnp.sum(jax.nn.softmax(dist_logits, axis=-1) * bins, axis=-1)
    sx, sy = centers[None, :, 0], centers[None, :, 1]
    s = strides[None, :]
    return jnp.stack(
        [
            sx - ltrb[..., 0] * s,
            sy - ltrb[..., 1] * s,
            sx + ltrb[..., 2] * s,
            sy + ltrb[..., 3] * s,
        ],
        axis=-1,
    )


def _iou_xyxy(a: Array, b: Array) -> Array:
    """Plain IoU between xyxy boxes [..., 4] (broadcasting)."""
    iw = jnp.maximum(
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]),
        0.0,
    )
    ih = jnp.maximum(
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]),
        0.0,
    )
    inter = iw * ih
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * jnp.maximum(
        a[..., 3] - a[..., 1], 0.0
    )
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * jnp.maximum(
        b[..., 3] - b[..., 1], 0.0
    )
    return inter / (area_a + area_b - inter + 1e-9)


def tal_assign(
    inside: Array,
    cls_logits: Array,
    pred_xyxy: Array,
    gt_xyxy: Array,
    gt_label: Array,
    top_k: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> Tuple[Array, Array, Array]:
    """Task-aligned assignment (Ultralytics TaskAlignedAssigner semantics).

    For each gt, anchors are scored by alignment = score^alpha * iou^beta
    (score = the anchor's sigmoid logit for the gt's class, iou against the
    anchor's *predicted* box), restricted to anchors whose center lies inside
    the gt; the top_k aligned anchors become its positives. An anchor claimed
    by several gts goes to the one with the highest alignment. Returns
    (assigned [B, A] gt index, positive [B, A], norm_align [B, A] — the
    alignment normalized per gt so its max equals the gt's best iou, the
    soft classification target TAL trains against).

    The fixed-capacity masked formulation replaces Ultralytics' boolean
    indexing; padded gt slots (valid=False) never receive anchors because
    ``inside`` is already masked by validity.
    """
    b, a, g = inside.shape
    scores = jax.nn.sigmoid(cls_logits)  # [B, A, C]
    cls_of_gt = jnp.take_along_axis(
        scores, jnp.clip(gt_label, 0, scores.shape[-1] - 1)[:, None], axis=-1
    )  # [B, A, G]
    iou = _iou_xyxy(pred_xyxy[:, :, None, :], gt_xyxy[:, None, :, :])
    iou = jnp.maximum(iou, 0.0)
    align = (cls_of_gt**alpha) * (iou**beta)
    align = jnp.where(inside, align, 0.0)

    # Per-gt top_k over anchors (ties/zeros excluded by a positive floor).
    k = min(top_k, a)
    topv = jax.lax.top_k(align.transpose(0, 2, 1), k)[0]  # [B, G, k]
    thresh = topv[..., -1][:, None, :]  # k-th best per gt
    is_topk = inside & (align >= jnp.maximum(thresh, 1e-9)) & (align > 0.0)

    # Conflict resolution: the gt with the highest alignment wins the anchor.
    claimed = jnp.where(is_topk, align, -1.0)
    assigned = jnp.argmax(claimed, axis=-1)  # [B, A]
    positive = jnp.any(is_topk, axis=-1)

    # Normalized alignment target: per gt, align * max_iou / max_align over
    # its claimed anchors (Ultralytics' norm_align_metric).
    win = (
        jax.nn.one_hot(assigned, g, dtype=bool)
        & positive[..., None]
        & is_topk
    )
    amax = jnp.max(jnp.where(win, align, 0.0), axis=1)  # [B, G]
    imax = jnp.max(jnp.where(win, iou, 0.0), axis=1)
    scale = imax / jnp.maximum(amax, 1e-9)  # [B, G]
    norm_align = jnp.take_along_axis(
        align * scale[:, None, :], assigned[..., None], axis=-1
    )[..., 0]
    return assigned, positive, jnp.where(positive, norm_align, 0.0)


def detection_loss(
    raw_outputs,
    targets: DetectionTargets,
    cfg: YoloConfig,
    box_weight: float = 7.5,
    cls_weight: float = 0.5,
    dfl_weight: float = 1.5,
    cls_smooth: float = 0.05,
    assigner: str = "center",
) -> Tuple[Array, dict]:
    """Total loss (scalar) and a metrics dict.

    ``cls_smooth`` caps the positive class target at 1 - cls_smooth.
    Without it, an easily-fit dataset drives sigmoid scores into exact f32
    saturation (1.0) — and the reference NMS keeps BOTH boxes on an exact
    confidence tie (detector.cu:350, a preserved quirk), so saturated
    duplicate boxes would never suppress each other and crowd real objects
    out of the fixed-capacity output.

    ``assigner``: "center" (closest-center-inside-box; simple and robust on
    the synthetic scenes) or "tal" (task-aligned assignment with soft
    alignment-scaled classification targets — the Ultralytics scheme).
    """
    dist_logits, cls_logits = _flatten_raw(raw_outputs, cfg)
    b, a = cls_logits.shape[:2]
    g = targets.xywh.shape[1]
    points, strides = anchor_points(cfg.input_size)  # [A, 2] (stride units)
    centers = points * strides[:, None]  # pixels

    gt_x0 = targets.xywh[..., 0]
    gt_y0 = targets.xywh[..., 1]
    gt_x1 = gt_x0 + targets.xywh[..., 2]
    gt_y1 = gt_y0 + targets.xywh[..., 3]

    # [B, A, G]: anchor center inside the gt box
    cx = centers[None, :, None, 0]
    cy = centers[None, :, None, 1]
    inside = (
        (cx >= gt_x0[:, None])
        & (cx < gt_x1[:, None])
        & (cy >= gt_y0[:, None])
        & (cy < gt_y1[:, None])
        & targets.valid[:, None]
    )
    soft_target = None
    if assigner == "tal":
        pred_xyxy = _decode_boxes(dist_logits, centers, strides, cfg)
        gt_xyxy = jnp.stack([gt_x0, gt_y0, gt_x1, gt_y1], axis=-1)
        # The assigner runs outside the gradient (Ultralytics wraps it in
        # no_grad): both the predicted boxes AND the class scores feeding
        # the alignment are stopped, otherwise the optimizer can lower the
        # loss by shrinking the soft target instead of fitting it.
        assigned, positive, soft_target = tal_assign(
            inside,
            jax.lax.stop_gradient(cls_logits),
            jax.lax.stop_gradient(pred_xyxy),
            gt_xyxy,
            targets.label,
        )
    else:
        gcx = (gt_x0 + gt_x1)[:, None] / 2
        gcy = (gt_y0 + gt_y1)[:, None] / 2
        d2 = (cx - gcx) ** 2 + (cy - gcy) ** 2
        d2 = jnp.where(inside, d2, jnp.inf)
        assigned = jnp.argmin(d2, axis=-1)  # [B, A]
        positive = jnp.any(inside, axis=-1)  # [B, A]

    # Gather assigned gt quantities per anchor.
    def gather_gt(field):  # [B, G] -> [B, A]
        return jnp.take_along_axis(field, assigned, axis=1)

    ax0 = gather_gt(gt_x0)
    ay0 = gather_gt(gt_y0)
    ax1 = gather_gt(gt_x1)
    ay1 = gather_gt(gt_y1)
    alab = gather_gt(targets.label)

    # Regression targets in stride units, clipped to the DFL support.
    sx = centers[None, :, 0]
    sy = centers[None, :, 1]
    s = strides[None, :]
    ltrb_t = jnp.stack(
        [(sx - ax0) / s, (sy - ay0) / s, (ax1 - sx) / s, (ay1 - sy) / s],
        axis=-1,
    )
    ltrb_t = jnp.clip(ltrb_t, 0.0, cfg.reg_max - 1.01)

    # DFL: two-hot cross-entropy between the bin distribution and the target.
    logp = jax.nn.log_softmax(dist_logits, axis=-1)  # [B, A, 4, reg]
    lo = jnp.floor(ltrb_t).astype(jnp.int32)
    hi = lo + 1
    w_hi = ltrb_t - lo
    w_lo = 1.0 - w_hi
    take_bin = lambda idx: jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]
    dfl = -(w_lo * take_bin(lo) + w_hi * take_bin(hi))  # [B, A, 4]
    dfl = jnp.mean(dfl, axis=-1)

    # Box CIoU on decoded boxes.
    bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
    ltrb_p = jnp.sum(jax.nn.softmax(dist_logits, axis=-1) * bins, axis=-1)
    px0 = sx - ltrb_p[..., 0] * s
    py0 = sy - ltrb_p[..., 1] * s
    px1 = sx + ltrb_p[..., 2] * s
    py1 = sy + ltrb_p[..., 3] * s
    ciou = _ciou(
        jnp.stack([px0, py0, px1, py1], axis=-1),
        jnp.stack([ax0, ay0, ax1, ay1], axis=-1),
    )
    box_loss = jnp.where(positive, 1.0 - ciou, 0.0)

    # Classification BCE: one-hot target on positives, zeros elsewhere.
    # TAL replaces the hard 1.0 with the normalized alignment (soft target),
    # which also bounds it away from sigmoid saturation like cls_smooth.
    pos_strength = (
        jnp.minimum(soft_target, 1.0 - cls_smooth)
        if soft_target is not None
        else positive.astype(jnp.float32) * (1.0 - cls_smooth)
    )
    cls_t = jax.nn.one_hot(alab, cfg.num_classes) * pos_strength[..., None]
    bce = jnp.maximum(cls_logits, 0) - cls_logits * cls_t + jnp.log1p(
        jnp.exp(-jnp.abs(cls_logits))
    )
    if targets.ignore_xywh is not None:
        # iscrowd convention: a negative anchor inside an ignore region is
        # excluded from the classification loss (positives keep theirs — a
        # real gt overlapping an ignore box still trains normally).
        igx0 = targets.ignore_xywh[..., 0]
        igy0 = targets.ignore_xywh[..., 1]
        igx1 = igx0 + targets.ignore_xywh[..., 2]
        igy1 = igy0 + targets.ignore_xywh[..., 3]
        in_ignore = jnp.any(
            (cx >= igx0[:, None])
            & (cx < igx1[:, None])
            & (cy >= igy0[:, None])
            & (cy < igy1[:, None])
            & targets.ignore_valid[:, None],
            axis=-1,
        )  # [B, A]
        bce = jnp.where((positive | ~in_ignore)[..., None], bce, 0.0)

    n_pos = jnp.maximum(jnp.sum(positive.astype(jnp.float32)), 1.0)
    box_term = jnp.sum(box_loss) / n_pos
    dfl_term = jnp.sum(jnp.where(positive, dfl, 0.0)) / n_pos
    # Ultralytics normalization: BCE summed over all anchors/classes divided
    # by the positive count — an anchor-mean would drown the positive-class
    # gradient under ~8400x negatives and cap achievable confidence.
    cls_term = jnp.sum(bce) / n_pos
    total = box_weight * box_term + dfl_weight * dfl_term + cls_weight * cls_term
    metrics = {
        "loss": total,
        "box_loss": box_term,
        "dfl_loss": dfl_term,
        "cls_loss": cls_term,
        "num_positive": n_pos,
    }
    return total, metrics
