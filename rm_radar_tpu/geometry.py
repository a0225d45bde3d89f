"""Geometry: letterbox transform math and LiDAR/camera/world transforms.

Pure jnp functions, usable both traced (inside jit) and eagerly. All of the
math mirrors the reference semantics:

* PreParam / letterbox:  reference src/detect/preparam.h:46-52
* Detection restore:     reference src/detect/detector.cpp:258-268
* lidarToCamera:         reference src/locate/locate.cpp:73-81
* cameraToLidar:         reference src/locate/locate.cpp:54-61
* lidarToWorld:          reference src/locate/locate.cpp:37-42
* Rect zoom:             reference src/locate/locate.cpp:337-350

Length units are millimeters throughout (the reference's convention); pixel
coordinates refer to the zoomed depth image where noted.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import Array, PreParams


def _mm(a: Array, b: Array) -> Array:
    """Small-matrix matmul at full float32 precision.

    TPU f32 matmuls default to bf16-accumulated passes; calibration
    transforms and filter algebra are tiny, so force HIGHEST precision.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def round_half_away(x):
    """std::round semantics: round half away from zero.

    numpy/jnp ``round`` is banker's rounding; the reference uses std::round
    (preparam.h:50-51, detector.cu:402-405), which rounds .5 away from zero.
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def compute_pre_param(
    src_height, src_width, dst_height: int, dst_width: int
) -> PreParams:
    """Compute the letterbox transform record for one image.

    Mirrors PreParam's size constructor (reference preparam.h:46-52):
    ratio = 1 / min(out_h / h, out_w / w); dw/dh are the half-paddings after
    scaling, using std::round on the scaled size.

    Arguments may be traced scalars (for dynamic crop sizes) or Python ints.
    """
    h = jnp.asarray(src_height, jnp.float32)
    w = jnp.asarray(src_width, jnp.float32)
    ratio = 1.0 / jnp.minimum(dst_height / h, dst_width / w)
    dw = (dst_width - round_half_away(w / ratio)) * 0.5
    dh = (dst_height - round_half_away(h / ratio)) * 0.5
    return PreParams(width=w, height=h, ratio=ratio, dw=dw, dh=dh)


def letterbox_padding(pparam: PreParams) -> Tuple[Array, Array, Array, Array]:
    """(top, bottom, left, right) integer paddings for a PreParam.

    The reference splits the padding with a +-0.1 rounding trick
    (detector.cu:402-405) so an odd total padding puts the extra pixel on the
    bottom/right side.
    """
    top = round_half_away(pparam.dh - 0.1).astype(jnp.int32)
    bottom = round_half_away(pparam.dh + 0.1).astype(jnp.int32)
    left = round_half_away(pparam.dw - 0.1).astype(jnp.int32)
    right = round_half_away(pparam.dw + 0.1).astype(jnp.int32)
    return top, bottom, left, right


def restore_boxes(xywh: Array, pparam: PreParams) -> Array:
    """Map boxes from network-input pixels back to source-image pixels.

    Mirrors ``Detector::restoreDetection`` (reference detector.cpp:258-268):
    x/y are unpadded, scaled by ratio and clamped to the image; w/h are
    scaled and clamped to the remaining extent.

    xywh: [..., 4]; pparam fields broadcast against the leading dims.
    """
    x, y, w, h = xywh[..., 0], xywh[..., 1], xywh[..., 2], xywh[..., 3]
    rx = jnp.clip((x - pparam.dw) * pparam.ratio, 0.0, pparam.width)
    ry = jnp.clip((y - pparam.dh) * pparam.ratio, 0.0, pparam.height)
    rw = jnp.clip(w * pparam.ratio, 0.0, pparam.width - rx)
    rh = jnp.clip(h * pparam.ratio, 0.0, pparam.height - ry)
    return jnp.stack([rx, ry, rw, rh], axis=-1)


class LidarCalib(NamedTuple):
    """Precomputed transform matrices for the locator, as device arrays.

    Derived from the calibration exactly as the reference Locator constructor
    does (locate.cpp:132-136): the camera→lidar rotation/translation come from
    inverting the lidar→camera 4x4, and camera→world from inverting
    world→camera.
    """

    intrinsic: Array  # [3, 3]
    intrinsic_inv: Array  # [3, 3]
    lidar_to_camera: Array  # [4, 4]
    camera_to_lidar_rot: Array  # [3, 3]
    camera_to_lidar_trans: Array  # [3]
    camera_to_world: Array  # [4, 4]
    zoom_factor: float

    @staticmethod
    def create(
        intrinsic: np.ndarray,
        lidar_to_camera: np.ndarray,
        world_to_camera: np.ndarray,
        zoom_factor: float,
    ) -> "LidarCalib":
        intrinsic = np.asarray(intrinsic, np.float32)
        l2c = np.asarray(lidar_to_camera, np.float32)
        w2c = np.asarray(world_to_camera, np.float32)
        c2l = np.linalg.inv(l2c.astype(np.float64)).astype(np.float32)
        return LidarCalib(
            intrinsic=jnp.asarray(intrinsic),
            intrinsic_inv=jnp.asarray(
                np.linalg.inv(intrinsic.astype(np.float64)).astype(np.float32)
            ),
            lidar_to_camera=jnp.asarray(l2c),
            camera_to_lidar_rot=jnp.asarray(c2l[:3, :3]),
            camera_to_lidar_trans=jnp.asarray(c2l[:3, 3]),
            camera_to_world=jnp.asarray(
                np.linalg.inv(w2c.astype(np.float64)).astype(np.float32)
            ),
            zoom_factor=float(zoom_factor),
        )


def lidar_to_camera_uvd(points: Array, calib: LidarCalib) -> Array:
    """Project LiDAR points (mm) to zoomed pixel coordinates plus depth.

    Mirrors ``Locator::lidarToCamera`` (reference locate.cpp:73-81):
    camera = K @ (T_l2c @ [p, 1])[:3]; u = cx * zoom / cz, v = cy * zoom / cz,
    d = cz.

    points: [..., 3] -> [..., 3] of (u, v, d).
    """
    cam = _mm(points, calib.lidar_to_camera[:3, :3].T) + calib.lidar_to_camera[:3, 3]
    proj = _mm(cam, calib.intrinsic.T)
    z = proj[..., 2]
    u = proj[..., 0] * calib.zoom_factor / z
    v = proj[..., 1] * calib.zoom_factor / z
    return jnp.stack([u, v, z], axis=-1)


def camera_to_lidar(uvd: Array, calib: LidarCalib) -> Array:
    """Back-project zoomed pixel + depth to LiDAR coordinates (mm).

    Mirrors ``Locator::cameraToLidar`` (reference locate.cpp:54-61):
    lidar = R_c2l @ (K^-1 @ d * [u/zoom, v/zoom, 1] + t_c2l).

    NOTE (preserved quirk): the reference adds the camera->lidar translation
    *before* rotating, so this is not the exact inverse of lidarToCamera for
    non-identity extrinsics — the result carries a constant offset of
    R_c2l @ t_c2l - t_true (~4 cm with the sample calibration, harmless at
    the 400 mm cluster tolerance). Reproduced verbatim for output parity;
    the reference's own round-trip test only uses identity calibration.

    uvd: [..., 3] of (u, v, depth) -> [..., 3].
    """
    ray = jnp.stack(
        [
            uvd[..., 0] / calib.zoom_factor,
            uvd[..., 1] / calib.zoom_factor,
            jnp.ones_like(uvd[..., 0]),
        ],
        axis=-1,
    )
    cam = _mm(ray, calib.intrinsic_inv.T) * uvd[..., 2:3] + calib.camera_to_lidar_trans
    return _mm(cam, calib.camera_to_lidar_rot.T)


def lidar_to_world(points: Array, calib: LidarCalib) -> Array:
    """LiDAR (mm) -> world (mm).

    Mirrors ``Locator::lidarToWorld`` (reference locate.cpp:37-42):
    world = T_c2w @ T_l2c @ [p, 1].
    """
    m = _mm(calib.camera_to_world, calib.lidar_to_camera)
    return _mm(points, m[:3, :3].T) + m[:3, 3]


def zoom_rect(
    xywh: Array, zoom_factor: float, zoomed_width: int, zoomed_height: int
) -> Array:
    """Scale a full-image rect into the zoomed depth image and clip.

    Mirrors ``Locator::zoom`` (reference locate.cpp:337-350), including the
    int truncations on width/height/x/y and the clip against the zoomed image
    rect. Returns int32 (x, y, w, h); a rect fully outside clips to zero size.
    """
    x, y, w, h = xywh[..., 0], xywh[..., 1], xywh[..., 2], xywh[..., 3]
    cx = x * zoom_factor + w * zoom_factor * 0.5
    cy = y * zoom_factor + h * zoom_factor * 0.5
    rw = (w * zoom_factor).astype(jnp.int32)
    rh = (h * zoom_factor).astype(jnp.int32)
    rx = (cx - rw.astype(jnp.float32) * 0.5).astype(jnp.int32)
    ry = (cy - rh.astype(jnp.float32) * 0.5).astype(jnp.int32)
    # cv::Rect intersection with the image rect.
    x0 = jnp.clip(rx, 0, zoomed_width)
    y0 = jnp.clip(ry, 0, zoomed_height)
    x1 = jnp.clip(rx + rw, 0, zoomed_width)
    y1 = jnp.clip(ry + rh, 0, zoomed_height)
    return jnp.stack(
        [x0, y0, jnp.maximum(x1 - x0, 0), jnp.maximum(y1 - y0, 0)], axis=-1
    )


def pairwise_iou(a: Array, b: Array) -> Array:
    """IoU between two sets of xywh boxes: [N, 4] x [M, 4] -> [N, M].

    Matches the reference device-side ``IoU`` (detector.cu:271-293): zero when
    there is no overlap (strict inequality: touching boxes have IoU 0 via
    zero-area intersection), otherwise intersection / union.
    """
    ax0, ay0 = a[..., :, None, 0], a[..., :, None, 1]
    ax1, ay1 = ax0 + a[..., :, None, 2], ay0 + a[..., :, None, 3]
    bx0, by0 = b[..., None, :, 0], b[..., None, :, 1]
    bx1, by1 = bx0 + b[..., None, :, 2], by0 + b[..., None, :, 3]
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    union = (
        a[..., :, None, 2] * a[..., :, None, 3]
        + b[..., None, :, 2] * b[..., None, :, 3]
        - inter
    )
    return inter / union


def union_iou(a: Array, b: Array) -> Array:
    """IoU with the *bounding-union* denominator used by RobotDetector dedup.

    The reference host-side ``computeIoU`` (detector.cpp:324-349) divides the
    intersection by the area of the bounding rectangle of the two boxes (not
    the set union), and returns 0 when that area is zero. Shapes broadcast:
    [..., 4] x [..., 4] -> [...].
    """
    ax0, ay0, aw, ah = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx0, by0, bw, bh = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ix0 = jnp.maximum(ax0, bx0)
    iy0 = jnp.maximum(ay0, by0)
    ix1 = jnp.minimum(ax0 + aw, bx0 + bw)
    iy1 = jnp.minimum(ay0 + ah, by0 + bh)
    inter = jnp.where(
        (ix0 < ix1) & (iy0 < iy1), (ix1 - ix0) * (iy1 - iy0), 0.0
    )
    ux0 = jnp.minimum(ax0, bx0)
    uy0 = jnp.minimum(ay0, by0)
    ux1 = jnp.maximum(ax0 + aw, bx0 + bw)
    uy1 = jnp.maximum(ay0 + ah, by0 + bh)
    union = (ux1 - ux0) * (uy1 - uy0)
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
