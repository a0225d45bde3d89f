"""Geometry tests.

Golden PreParam values mirror the reference detector tests
(test/detect/detector_test.cpp:28-68): an 810x1080 image letterboxed to
640x640 yields dw=80, dh=0; a 1280x720 image yields dw=0, dh=140. The
transform round-trip tests mirror test/locate/locator_test.cpp:53-74.
"""

import jax.numpy as jnp
import numpy as np

from rm_radar_tpu import geometry
from rm_radar_tpu.configs import Calibration


def test_preparam_bus_image():
    # bus.jpg is 810x1080 (w x h): ratio = 1/min(640/1080, 640/810) = 1080/640
    p = geometry.compute_pre_param(1080, 810, 640, 640)
    assert np.isclose(float(p.ratio), 1080.0 / 640.0)
    assert np.isclose(float(p.dh), 0.0)
    # round(810 / (1080/640)) = round(480) = 480 -> dw = (640-480)/2 = 80
    assert np.isclose(float(p.dw), 80.0)


def test_preparam_zidane_image():
    # zidane.jpg is 1280x720: ratio = 1/min(640/720, 640/1280) = 2.0
    p = geometry.compute_pre_param(720, 1280, 640, 640)
    assert np.isclose(float(p.ratio), 2.0)
    assert np.isclose(float(p.dw), 0.0)
    assert np.isclose(float(p.dh), 140.0)


def test_preparam_camera_frame():
    # The bundled 2592x2048 camera frames.
    p = geometry.compute_pre_param(2048, 2592, 640, 640)
    assert np.isclose(float(p.ratio), 2592.0 / 640.0)
    assert np.isclose(float(p.dw), 0.0)
    # round(2048 / 4.05) = round(505.679) = 506 -> dh = (640-506)/2 = 67
    assert np.isclose(float(p.dh), 67.0)
    top, bottom, left, right = geometry.letterbox_padding(p)
    assert (int(top), int(bottom), int(left), int(right)) == (67, 67, 0, 0)


def test_padding_split_rounding():
    # Odd padding: dh = 66.5 -> top = round(66.4) = 66, bottom = round(66.6) = 67
    from rm_radar_tpu.types import PreParams

    p = PreParams(
        width=jnp.float32(100.0),
        height=jnp.float32(100.0),
        ratio=jnp.float32(1.0),
        dw=jnp.float32(0.0),
        dh=jnp.float32(66.5),
    )
    top, bottom, left, right = geometry.letterbox_padding(p)
    assert (int(top), int(bottom)) == (66, 67)
    assert (int(left), int(right)) == (0, 0)


def test_restore_boxes():
    p = geometry.compute_pre_param(720, 1280, 640, 640)
    # Box at network coords (100, 150, 50, 60): x' = (100-0)*2 = 200,
    # y' = (150-140)*2 = 20, w' = 100, h' = 120.
    out = geometry.restore_boxes(jnp.array([100.0, 150.0, 50.0, 60.0]), p)
    np.testing.assert_allclose(np.asarray(out), [200.0, 20.0, 100.0, 120.0])
    # Clamping: negative unpadded coords clamp to 0; w clamps to remaining.
    out2 = geometry.restore_boxes(jnp.array([-10.0, 0.0, 2000.0, 10.0]), p)
    assert float(out2[0]) == 0.0
    assert float(out2[2]) == 1280.0


def _identity_calib(zoom=0.5):
    return geometry.LidarCalib.create(
        np.eye(3, dtype=np.float32),
        np.eye(4, dtype=np.float32),
        np.eye(4, dtype=np.float32),
        zoom,
    )


def test_transform_roundtrip_identity():
    # Mirrors locator_test.cpp round-trip with identity calibration.
    calib = _identity_calib()
    pts = jnp.array([[1000.0, 2000.0, 5000.0], [-300.0, 100.0, 2000.0]])
    uvd = geometry.lidar_to_camera_uvd(pts, calib)
    back = geometry.camera_to_lidar(uvd, calib)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-4)


def test_camera_to_lidar_reference_formula_real_calibration():
    """The reference's cameraToLidar is NOT the exact inverse of
    lidarToCamera for non-identity extrinsics (it translates before
    rotating, locate.cpp:54-61) — verify we reproduce the exact published
    formula rather than the mathematical inverse."""
    c = Calibration()
    calib = geometry.LidarCalib.create(
        c.intrinsic_np(), c.lidar_to_camera_np(), c.world_to_camera_np(), 0.5
    )
    k_inv = np.linalg.inv(c.intrinsic_np().astype(np.float64))
    c2l = np.linalg.inv(c.lidar_to_camera_np().astype(np.float64))
    rot, trans = c2l[:3, :3], c2l[:3, 3]
    for u, v, d in [(100.0, 200.0, 5000.0), (640.0, 512.0, 12000.0)]:
        expected = rot @ (k_inv @ (d * np.array([u / 0.5, v / 0.5, 1.0])) + trans)
        got = geometry.camera_to_lidar(jnp.array([u, v, d]), calib)
        # atol accounts for f32 cancellation against the f64 oracle.
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=0.05)
    # And the round trip differs by the constant quirk offset: R @ t - t.
    pts = jnp.array([[19427.0, 2560.0, 1833.0]], jnp.float32)
    back = geometry.camera_to_lidar(
        geometry.lidar_to_camera_uvd(pts, calib), calib
    )
    pts2 = jnp.array([[15000.0, -2000.0, 500.0]], jnp.float32)
    back2 = geometry.camera_to_lidar(
        geometry.lidar_to_camera_uvd(pts2, calib), calib
    )
    d1 = np.asarray(back)[0] - np.asarray(pts)[0]
    d2 = np.asarray(back2)[0] - np.asarray(pts2)[0]
    np.testing.assert_allclose(d1, d2, atol=0.5)


def test_lidar_to_world_identity():
    calib = _identity_calib()
    pts = jnp.array([[1.0, 2.0, 3.0]])
    out = geometry.lidar_to_world(pts, calib)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_zoom_rect():
    # Mirrors locator_test.cpp:43-51 zoom math with zoom=0.5: a rect scales
    # by 0.5 about its center and clips to the zoomed image.
    r = geometry.zoom_rect(
        jnp.array([100.0, 200.0, 50.0, 80.0]), 0.5, 1296, 1024
    )
    # center = (50+12.5, 100+20) = (62.5, 120); w=25, h=40;
    # x = int(62.5-12.5)=50, y = int(120-20)=100
    assert list(np.asarray(r)) == [50, 100, 25, 40]
    # Clipping at the border.
    r2 = geometry.zoom_rect(jnp.array([-100.0, -100.0, 300.0, 300.0]), 0.5, 1296, 1024)
    x, y, w, h = list(np.asarray(r2))
    assert x == 0 and y == 0 and w > 0 and h > 0


def test_pairwise_iou():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 10.0, 10.0], [20.0, 20.0, 5.0, 5.0]])
    iou = np.asarray(geometry.pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-6)
    assert iou[0, 1] == 0.0


def test_union_iou_bounding_denominator():
    # computeIoU (detector.cpp:324-349) uses the bounding rect as denominator.
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 0.0, 10.0, 10.0])
    # intersection = 50, bounding rect = 15x10 = 150
    np.testing.assert_allclose(float(geometry.union_iou(a, b)), 50.0 / 150.0)
