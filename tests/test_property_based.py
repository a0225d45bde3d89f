"""Property-based (hypothesis) tests for the masked-SoA algorithms whose
reference counterparts are pointer/map-based host loops: NMS vs a direct
NMSKernel re-implementation (detector.cu:341-357), same-label dedup vs the
RobotDetector winner-map loop (detector.cpp:431-450). Randomized + adversarial
value ties, duplicate boxes, degenerate boxes, capacity saturation.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from rm_radar_tpu.ops.detect_ops import nms


def _iou_np(a, b):
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    iw = max(min(ax0 + aw, bx0 + bw) - max(ax0, bx0), 0.0)
    ih = max(min(ay0 + ah, by0 + bh) - max(ay0, by0), 0.0)
    inter = iw * ih
    union = aw * ah + bw * bh - inter
    return inter / union if union != 0 else np.nan


def _nms_oracle(xywh, label, conf, nms_thresh, conf_thresh):
    """Direct transliteration of NMSKernel semantics: box i survives iff
    conf >= thresh and no same-label, strictly-higher-conf box overlaps it
    with IoU > nms_thresh."""
    n = len(conf)
    keep = []
    for i in range(n):
        if conf[i] < conf_thresh:
            continue
        dead = False
        for j in range(n):
            if j == i or label[j] != label[i] or conf[j] <= conf[i]:
                continue
            if _iou_np(xywh[j], xywh[i]) > nms_thresh:
                dead = True
                break
        if not dead:
            keep.append(i)
    keep.sort(key=lambda i: -conf[i])
    return keep


# Quantized coordinates/confidences force exact ties; tiny boxes allowed.
_box = st.tuples(
    st.integers(0, 12), st.integers(0, 12), st.integers(0, 8), st.integers(0, 8)
)


@settings(max_examples=60, deadline=None)
@given(
    boxes=st.lists(_box, min_size=1, max_size=24),
    labels=st.lists(st.integers(0, 2), min_size=24, max_size=24),
    confs=st.lists(st.integers(0, 8), min_size=24, max_size=24),
)
def test_nms_matches_reference_oracle(boxes, labels, confs):
    n = len(boxes)
    xywh = np.asarray(boxes, np.float32)
    label = np.asarray(labels[:n], np.int32)
    conf = np.asarray(confs[:n], np.float32) / 8.0
    got = nms(
        jnp.asarray(xywh),
        jnp.asarray(label),
        jnp.asarray(conf),
        nms_thresh=0.45,
        conf_thresh=0.25,
        top_k=32,
        max_detections=32,
    )
    expect = _nms_oracle(xywh, label, conf, 0.45, 0.25)
    got_valid = np.asarray(got.valid)
    got_boxes = np.asarray(got.xywh)[got_valid]
    got_conf = np.asarray(got.confidence)[got_valid]
    exp_boxes = xywh[expect]
    exp_conf = conf[expect]
    assert got_valid.sum() == len(expect)
    # Survivor SETS must match; order within equal-confidence runs may
    # differ between top_k and the oracle sort (both are conf-descending).
    np.testing.assert_array_equal(np.sort(got_conf), np.sort(exp_conf))
    gb = got_boxes[np.lexsort(got_boxes.T)]
    eb = exp_boxes[np.lexsort(exp_boxes.T)]
    np.testing.assert_array_equal(gb, eb)


def _dedup_oracle(rect, label, conf, detected, valid, iou_thresh):
    """detector.cpp:431-450: first detected car of a label holds it; a later
    same-label car is dropped when union-IoU > thresh, else replaces the
    holder iff strictly more confident."""

    def union_iou(a, b):
        ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
        ix1 = min(a[0] + a[2], b[0] + b[2])
        iy1 = min(a[1] + a[3], b[1] + b[3])
        inter = (ix1 - ix0) * (iy1 - iy0) if ix0 < ix1 and iy0 < iy1 else 0.0
        ux0, uy0 = min(a[0], b[0]), min(a[1], b[1])
        ux1 = max(a[0] + a[2], b[0] + b[2])
        uy1 = max(a[1] + a[3], b[1] + b[3])
        u = (ux1 - ux0) * (uy1 - uy0)
        return inter / u if u > 0 else 0.0

    winner = {}
    for i in range(len(rect)):
        if not (valid[i] and detected[i]):
            continue
        l = int(label[i])
        if l not in winner:
            winner[l] = i
        else:
            w = winner[l]
            if union_iou(rect[w], rect[i]) > iou_thresh:
                continue
            if conf[i] > conf[w]:
                winner[l] = i
    keep = set(winner.values())
    return [
        bool(valid[i]) and (not detected[i] or i in keep)
        for i in range(len(rect))
    ]


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 10),
    data=st.data(),
)
def test_dedup_matches_reference_oracle(n, data):
    from rm_radar_tpu.detect.detector import _dedup_same_label

    rect = np.asarray(
        data.draw(st.lists(_box, min_size=n, max_size=n)), np.float32
    )
    label = np.asarray(
        data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n)),
        np.int32,
    )
    conf = (
        np.asarray(
            data.draw(st.lists(st.integers(0, 4), min_size=n, max_size=n)),
            np.float32,
        )
        / 4.0
    )
    detected = np.asarray(
        data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    )
    valid = np.asarray(
        data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    )
    got = np.asarray(
        _dedup_same_label(
            jnp.asarray(rect),
            jnp.asarray(label),
            jnp.asarray(conf),
            jnp.asarray(detected),
            jnp.asarray(valid),
            class_num=4,
            iou_thresh=0.75,
        )
    )
    expect = _dedup_oracle(rect, label, conf, detected, valid, 0.75)
    np.testing.assert_array_equal(got, np.asarray(expect))
