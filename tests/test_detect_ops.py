"""Decode + NMS tests (reference decodeKernel / NMSKernel semantics)."""

import numpy as np
import jax.numpy as jnp

from rm_radar_tpu.ops import detect_ops
from rm_radar_tpu.geometry import compute_pre_param


def _raw(anchors):
    """Build a raw [4+classes, A] tensor from a list of
    (cx, cy, w, h, scores...) rows."""
    a = np.asarray(anchors, np.float32)
    return jnp.asarray(a.T)


def test_decode_argmax_and_corner():
    raw = _raw(
        [
            [50.0, 60.0, 20.0, 30.0, 0.1, 0.9],  # label 1
            [5.0, 5.0, 20.0, 30.0, 0.8, 0.3],  # label 0, clamps x/y at 0
        ]
    )
    xywh, label, conf = detect_ops.decode(raw)
    np.testing.assert_allclose(np.asarray(xywh[0]), [40.0, 45.0, 20.0, 30.0])
    # x = max(5 - 10, 0) = 0; y = max(5 - 15, 0) = 0; w/h not clamped.
    np.testing.assert_allclose(np.asarray(xywh[1]), [0.0, 0.0, 20.0, 30.0])
    assert list(np.asarray(label)) == [1, 0]
    np.testing.assert_allclose(np.asarray(conf), [0.9, 0.8])


def _nms(anchors, **kw):
    raw = _raw(anchors)
    xywh, label, conf = detect_ops.decode(raw)
    kw.setdefault("nms_thresh", 0.65)
    kw.setdefault("conf_thresh", 0.25)
    kw.setdefault("top_k", 8)
    kw.setdefault("max_detections", 8)
    return detect_ops.nms(xywh, label, conf, **kw)


def test_nms_suppresses_lower_conf_same_label():
    dets = _nms(
        [
            [50.0, 50.0, 20.0, 20.0, 0.9, 0.0],
            [51.0, 51.0, 20.0, 20.0, 0.8, 0.0],  # heavy overlap, lower conf
            [200.0, 200.0, 20.0, 20.0, 0.7, 0.0],  # far away
        ]
    )
    assert int(dets.count()) == 2
    np.testing.assert_allclose(
        np.sort(np.asarray(dets.confidence)[np.asarray(dets.valid)]),
        [0.7, 0.9],
    )


def test_nms_different_labels_do_not_suppress():
    dets = _nms(
        [
            [50.0, 50.0, 20.0, 20.0, 0.9, 0.0],
            [51.0, 51.0, 20.0, 20.0, 0.0, 0.8],  # same box, other class
        ]
    )
    assert int(dets.count()) == 2


def test_nms_conf_threshold():
    dets = _nms([[50.0, 50.0, 20.0, 20.0, 0.2, 0.0]])
    assert int(dets.count()) == 0


def test_nms_equal_confidence_keeps_both():
    # Reference uses a strict comparison (comp_conf > row_conf), so exact
    # ties survive on both sides (detector.cu:350).
    dets = _nms(
        [
            [50.0, 50.0, 20.0, 20.0, 0.9, 0.0],
            [50.0, 50.0, 20.0, 20.0, 0.9, 0.0],
        ]
    )
    assert int(dets.count()) == 2


def test_postprocess_restores_coordinates():
    pparam = compute_pre_param(720, 1280, 640, 640)  # ratio 2, dh 140
    raw = _raw([[100.0, 200.0, 40.0, 60.0, 0.9, 0.1]])
    dets = detect_ops.postprocess(
        raw, pparam, nms_thresh=0.65, conf_thresh=0.25, top_k=4, max_detections=4
    )
    assert int(dets.count()) == 1
    # network box: x = 100-20 = 80, y = 200-30 = 170
    # restored: x = 80*2 = 160, y = (170-140)*2 = 60, w = 80, h = 120
    np.testing.assert_allclose(
        np.asarray(dets.xywh[0]), [160.0, 60.0, 80.0, 120.0]
    )


def test_nms_chain_no_cascade_rescue():
    # A suppresses B (higher conf, overlap); B would suppress C; the
    # reference's one-shot formulation still kills C because suppression is
    # evaluated against the original (pre-NMS) boxes.
    dets = _nms(
        [
            [50.0, 50.0, 20.0, 20.0, 0.9, 0.0],
            [54.0, 50.0, 20.0, 20.0, 0.8, 0.0],
            [58.0, 50.0, 20.0, 20.0, 0.7, 0.0],
        ],
        nms_thresh=0.5,
    )
    assert int(dets.count()) == 1
    np.testing.assert_allclose(
        np.asarray(dets.confidence)[np.asarray(dets.valid)], [0.9]
    )
