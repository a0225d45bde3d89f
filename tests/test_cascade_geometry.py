"""Cascade geometry tests with stub models: exact coordinate propagation
through letterbox -> car decode/NMS/restore -> crop -> armor decode/NMS/
restore -> origin shift -> robot assembly -> dedup, with hand-computed
expectations (the model itself is stubbed with constant raw outputs, so
every number is exact).

Scene: 96x128 image. pparam: ratio 2, dw 0, dh 8 (64x64 net input).
Car at image rect (20, 30, 40, 32) -> net box x=10, y=23, w=20, h=16.
Crop (40x32): ratio 0.625, rh 51, dh 6.5. Armor at crop rect (8, 4, 10, 8)
-> crop-net box x=12.8, y=12.9, w=16, h=12.8 -> restored (8, 4, 10, 8)
-> shifted to full image (28, 34, 10, 8).
"""

import types

import numpy as np
import jax.numpy as jnp
import pytest

from rm_radar_tpu.configs import RobotDetectorConfig
from rm_radar_tpu.detect.detector import RobotDetector

CFG = RobotDetectorConfig(
    max_cars=4,
    max_armors_per_car=4,
    input_width=64,
    input_height=64,
    armor_input_width=64,
    armor_input_height=64,
)

A = 84  # anchors at 64x64


def _raw_single(boxes, n_classes):
    """[(cx, cy, w, h, label, conf), ...] -> raw [4+n_classes, A]."""
    raw = np.zeros((4 + n_classes, A), np.float32)
    for k, (cx, cy, w, h, label, conf) in enumerate(boxes):
        raw[0, k], raw[1, k], raw[2, k], raw[3, k] = cx, cy, w, h
        raw[4 + label, k] = conf
    return raw


def _stub(detector, raw_batched):
    """Replace a Detector's model with one returning a constant raw output
    broadcast to the incoming batch size."""
    const = jnp.asarray(raw_batched)

    def apply(variables, x, *args, **kwargs):
        return jnp.broadcast_to(const, (x.shape[0],) + const.shape)

    detector.model = types.SimpleNamespace(apply=apply, dtype=jnp.float32)


def _make(car_boxes, armor_boxes):
    det = RobotDetector(CFG, "n", "n", dtype=jnp.float32)
    _stub(det.car, _raw_single(car_boxes, 1))
    _stub(det.armor, _raw_single(armor_boxes, 12))
    return det


def _detect(det):
    img = np.zeros((96, 128, 3), np.uint8)
    return det.detect(img)


CAR_NET = (20.0, 31.0, 20.0, 16.0)  # cx, cy, w, h in 64x64 net coords
ARMOR_NET = (20.8, 19.3, 16.0, 12.8)  # in crop-net coords


def test_single_car_single_armor_exact_geometry():
    det = _make(
        [CAR_NET + (0, 0.9)],
        [ARMOR_NET + (3, 0.8)],
    )
    batch = _detect(det)
    valid = np.asarray(batch.valid)
    assert valid.sum() == 1
    i = int(np.argmax(valid))
    np.testing.assert_allclose(
        np.asarray(batch.rect)[i], [20.0, 30.0, 40.0, 32.0], atol=1e-4
    )
    assert int(np.asarray(batch.label)[i]) == 3
    np.testing.assert_allclose(float(np.asarray(batch.confidence)[i]), 0.8, rtol=1e-6)
    assert bool(np.asarray(batch.detected)[i])
    av = np.asarray(batch.armor_valid)[i]
    assert av.sum() == 1
    j = int(np.argmax(av))
    np.testing.assert_allclose(
        np.asarray(batch.armor_xywh)[i, j], [28.0, 34.0, 10.0, 8.0], atol=0.05
    )


def test_car_without_armor_is_undetected_but_valid():
    det = _make([CAR_NET + (0, 0.9)], [ARMOR_NET + (3, 0.2)])  # below 0.5
    batch = _detect(det)
    valid = np.asarray(batch.valid)
    assert valid.sum() == 1
    i = int(np.argmax(valid))
    assert not bool(np.asarray(batch.detected)[i])
    assert int(np.asarray(batch.label)[i]) == -1
    assert not np.asarray(batch.armor_valid)[i].any()


def test_same_label_disjoint_cars_dedup_keeps_higher_conf():
    """Two disjoint cars whose armors carry the same label: the per-label
    map keeps only the higher-confidence robot (detector.cpp:431-450).

    (Note: the overlap skip-branch of the reference dedup is unreachable in
    practice — car pairs with union-IoU > 0.75 are already merged by the car
    NMS at 0.65 since union-IoU <= set-IoU — so confidence selection is the
    observable behavior.)"""
    second = (44.0, 31.0, 20.0, 16.0)  # disjoint from CAR_NET
    det = _make(
        [CAR_NET + (0, 0.9), second + (0, 0.8)],
        [ARMOR_NET + (3, 0.8)],  # both cars see label-3 armor
    )
    batch = _detect(det)
    assert np.asarray(batch.valid).sum() == 1
    i = int(np.argmax(np.asarray(batch.valid)))
    # Higher-confidence car (slot 0 after NMS ordering) holds the label.
    np.testing.assert_allclose(
        np.asarray(batch.rect)[i], [20.0, 30.0, 40.0, 32.0], atol=1e-3
    )


def test_different_label_cars_both_kept():
    second = (44.0, 31.0, 20.0, 16.0)
    det = RobotDetector(CFG, "n", "n", dtype=jnp.float32)
    _stub(det.car, _raw_single([CAR_NET + (0, 0.9), second + (0, 0.8)], 1))
    # Both crops get the same armor geometry; to give different labels per
    # crop we'd need per-crop raw outputs — instead verify that two armors
    # with different labels on the SAME crop yield the argmax label.
    _stub(
        det.armor,
        _raw_single([ARMOR_NET + (3, 0.8), (40.0, 19.3, 12.0, 10.0, 5, 0.6)], 12),
    )
    batch = _detect(det)
    # Same label argmax (3) for both cars -> dedup to one; the kept robot's
    # feature must reflect both armors (labels 3 and 5).
    i = int(np.argmax(np.asarray(batch.valid)))
    feats = np.asarray(batch.feature(12))[i]
    np.testing.assert_allclose(feats[3], 0.8 / 1.4, rtol=1e-5)
    np.testing.assert_allclose(feats[5], 0.6 / 1.4, rtol=1e-5)
    # label = argmax of per-class sums, confidence = sum/count for label 3
    assert int(np.asarray(batch.label)[i]) == 3
    np.testing.assert_allclose(
        float(np.asarray(batch.confidence)[i]), 0.8, rtol=1e-5
    )


def test_robot_feature_vector():
    det = _make([CAR_NET + (0, 0.9)], [ARMOR_NET + (3, 0.8)])
    batch = _detect(det)
    feats = np.asarray(batch.feature(12))
    i = int(np.argmax(np.asarray(batch.valid)))
    expected = np.zeros(12, np.float32)
    expected[3] = 1.0  # single armor -> L1-normalized one-hot
    np.testing.assert_allclose(feats[i], expected, atol=1e-6)
