"""Core data types of the rm_radar_tpu framework.

The reference (zmsbruce/rm_radar) models detections, robots and tracks as
heap-allocated C++ objects with ``std::optional`` fields (src/robot/robot.h,
src/detect/detection.h). On TPU, dynamic object counts break XLA's static
shape requirement, so every collection here is a fixed-capacity
struct-of-arrays with an explicit validity mask — the TPU-native analogue of
the reference's "label = NaN means suppressed" convention
(src/detect/detector.cu:341-357).

All containers are NamedTuples so they are automatically JAX pytrees and can
flow through jit / vmap / shard_map without registration.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _host(tree):
    """Fetch a pytree to host numpy in ONE transfer; raises on tracers."""
    import jax

    return jax.device_get(tree)


def _fmt(x: float) -> str:
    return f"{float(x):.2f}"


class Label(enum.IntEnum):
    """Robot class labels, identical to reference src/robot/robot.h:32-45."""

    BLUE_HERO = 0
    BLUE_ENGINEER = 1
    BLUE_INFANTRY_3 = 2
    BLUE_INFANTRY_4 = 3
    BLUE_INFANTRY_5 = 4
    RED_HERO = 5
    RED_ENGINEER = 6
    RED_INFANTRY_3 = 7
    RED_INFANTRY_4 = 8
    RED_INFANTRY_5 = 9
    BLUE_SENTRY = 10
    RED_SENTRY = 11


class TrackState(enum.IntEnum):
    """Track lifecycle state (reference src/track/track.h:28), plus NONE for
    the masked/SoA representation."""

    NONE = -1
    TENTATIVE = 0
    CONFIRMED = 1
    DELETED = 2


NOT_MATCHED = -1  # reference src/track/auction.h:21


class Detections(NamedTuple):
    """Fixed-capacity batch of detections.

    Equivalent to ``std::vector<radar::Detection>`` (src/detect/detection.h:
    25-68) but as struct-of-arrays with a validity mask. Boxes are stored as
    (x, y, w, h) with (x, y) the top-left corner, matching the decoded layout
    of the reference (src/detect/detector.cu:237-250).

    Leading dimensions may include a batch axis: shapes are ``[..., N, 4]``
    for ``xywh`` and ``[..., N]`` for the rest.
    """

    xywh: Array  # float32 [..., N, 4]
    label: Array  # int32   [..., N], -1 when invalid
    confidence: Array  # float32 [..., N]
    valid: Array  # bool    [..., N]

    @property
    def capacity(self) -> int:
        return self.xywh.shape[-2]

    def count(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(n: int, batch_shape: tuple = ()) -> "Detections":
        shape = tuple(batch_shape) + (n,)
        return Detections(
            xywh=jnp.zeros(shape + (4,), jnp.float32),
            label=jnp.full(shape, -1, jnp.int32),
            confidence=jnp.zeros(shape, jnp.float32),
            valid=jnp.zeros(shape, bool),
        )

    def summary(self) -> str:
        """JSON-ish dump of the valid detections, mirroring the reference's
        ``operator<<(std::ostream&, const Detection&)``
        (src/detect/detection.h:53-60)."""
        d = _host(self)
        if np.ndim(d.valid) != 1:  # batched: counts only
            return (
                f"Detections(batch={d.valid.shape[:-1]}, "
                f"capacity={d.valid.shape[-1]}, "
                f"counts={d.valid.sum(axis=-1).tolist()})"
            )
        rows = [
            '{"x": %s, "y": %s, "width": %s, "height": %s, '
            '"label": %d, "confidence": %s}'
            % (
                _fmt(d.xywh[i, 0]),
                _fmt(d.xywh[i, 1]),
                _fmt(d.xywh[i, 2]),
                _fmt(d.xywh[i, 3]),
                int(d.label[i]),
                _fmt(d.confidence[i]),
            )
            for i in range(d.valid.shape[0])
            if d.valid[i]
        ]
        return (
            f"Detections({len(rows)}/{d.valid.shape[0]} valid: ["
            + ", ".join(rows)
            + "])"
        )

    def __repr__(self) -> str:
        try:
            return self.summary()
        except Exception:  # traced/abstract values: shapes only
            return (
                f"Detections(capacity={self.xywh.shape[-2]}, "
                f"xywh={getattr(self.xywh, 'shape', None)})"
            )


class PreParams(NamedTuple):
    """Letterbox transform record, one row per image.

    Equivalent to ``radar::detect::PreParam`` (src/detect/preparam.h:46-52):
    ``ratio`` is the scale from network input back to the source image,
    ``dw``/``dh`` are the half-paddings in network-input pixels.
    """

    width: Array  # float32 [...]: source image width
    height: Array  # float32 [...]: source image height
    ratio: Array  # float32 [...]
    dw: Array  # float32 [...]
    dh: Array  # float32 [...]


class RobotBatch(NamedTuple):
    """Fixed-capacity batch of fused robot observations.

    Equivalent to ``std::vector<radar::Robot>`` (src/robot/robot.h:53-164)
    in struct-of-arrays form. A robot may independently be detected
    (``detected``), located (``located``) and tracked (``track_state >= 0``),
    mirroring the all-optional fields of the reference.

    Shapes: R = robot capacity, A = armor capacity per robot.
    """

    # Detection state (reference robot.cpp:41-74)
    rect: Array  # float32 [R, 4] car bbox xywh in full-image pixels
    label: Array  # int32   [R], -1 when no armor evidence
    confidence: Array  # float32 [R]
    detected: Array  # bool    [R]: has at least one armor (isDetected)
    valid: Array  # bool    [R]: slot holds a real car detection
    armor_xywh: Array  # float32 [R, A, 4] in full-image pixels
    armor_label: Array  # int32   [R, A]
    armor_conf: Array  # float32 [R, A]
    armor_valid: Array  # bool    [R, A]
    # Location state (meters; reference robot.h:93-95 converts mm -> m)
    location: Array  # float32 [R, 3]
    located: Array  # bool    [R]
    # Track state (reference robot.h:119-127)
    track_state: Array  # int32 [R], TrackState values, NONE=-1
    # TRUE car-NMS survivor count (pre-dedup), int32 scalar, counted at the
    # detector's full ``config.max_cars`` capacity — NOT capped at the armor
    # bucket the frame ran in. ``n_cars > bucket`` therefore means detections
    # were actually clipped and the frame must be repaired at a bigger bucket
    # (pipeline.run_stream / run_stream_batch); ``n_cars == bucket`` is a
    # full-but-exact frame. The reference's dynamic batch sizes itself on
    # exactly this count (detector.cpp:417-424).
    n_cars: Array = np.zeros((), np.int32)
    # NMS-saturation telemetry: per-image anchors above conf_thresh entering
    # NMS (car stage, and the max over car slots for the armor stage). The
    # top-K NMS pool (configs.nms_top_k) is exact only while these stay
    # under top_k — the bench and stream stats alarm when they approach it
    # (the regime where semantics would diverge from the reference's
    # all-pairs NMS, detector.cu:315-360).
    nms_candidates_car: Array = np.zeros((), np.int32)
    nms_candidates_armor: Array = np.zeros((), np.int32)

    @property
    def capacity(self) -> int:
        return self.rect.shape[0]

    @staticmethod
    def empty(num_robots: int, num_armors: int) -> "RobotBatch":
        r, a = num_robots, num_armors
        return RobotBatch(
            rect=jnp.zeros((r, 4), jnp.float32),
            label=jnp.full((r,), -1, jnp.int32),
            confidence=jnp.zeros((r,), jnp.float32),
            detected=jnp.zeros((r,), bool),
            valid=jnp.zeros((r,), bool),
            armor_xywh=jnp.zeros((r, a, 4), jnp.float32),
            armor_label=jnp.full((r, a), -1, jnp.int32),
            armor_conf=jnp.zeros((r, a), jnp.float32),
            armor_valid=jnp.zeros((r, a), bool),
            location=jnp.zeros((r, 3), jnp.float32),
            located=jnp.zeros((r,), bool),
            track_state=jnp.full((r,), int(TrackState.NONE), jnp.int32),
        )

    def feature(self, class_num: int) -> Array:
        """Per-robot class-confidence feature, L1-normalized.

        Equivalent to ``Robot::feature`` (reference src/robot/robot.cpp:
        102-122): sums armor confidences per class, normalizes by the total;
        all-zeros when the robot has no armors.

        Returns float32 [R, class_num].
        """
        r, a = self.armor_label.shape
        one_hot = (
            self.armor_label[..., None]
            == jnp.arange(class_num, dtype=jnp.int32)
        ) & self.armor_valid[..., None]
        feat = jnp.sum(
            one_hot.astype(jnp.float32) * self.armor_conf[..., None], axis=-2
        )
        total = jnp.sum(feat, axis=-1, keepdims=True)
        feat = jnp.where(total > 0, feat / jnp.where(total > 0, total, 1.0), 0.0)
        return jnp.where(self.detected[:, None], feat, 0.0)

    def summary(self) -> str:
        """JSON-ish dump of the valid robots, mirroring the reference's
        ``operator<<(std::ostream&, const Robot&)`` (src/robot/robot.cpp:
        124-156): label, confidence, rect, armors, location, track state."""
        b = _host(self)
        if np.ndim(b.valid) != 1:
            return (
                f"RobotBatch(batch={b.valid.shape[:-1]}, "
                f"capacity={b.valid.shape[-1]}, "
                f"counts={b.valid.sum(axis=-1).tolist()})"
            )
        state_names = {s.value: s.name.lower() for s in TrackState}
        rows = []
        for i in range(b.valid.shape[0]):
            if not b.valid[i]:
                continue
            parts = [f'"rect": [{", ".join(_fmt(v) for v in b.rect[i])}]']
            if b.detected[i]:
                parts.append(f'"label": {int(b.label[i])}')
                parts.append(f'"confidence": {_fmt(b.confidence[i])}')
                armors = [
                    '[%s, %d, %s]'
                    % (
                        ", ".join(_fmt(v) for v in b.armor_xywh[i, j]),
                        int(b.armor_label[i, j]),
                        _fmt(b.armor_conf[i, j]),
                    )
                    for j in range(b.armor_valid.shape[1])
                    if b.armor_valid[i, j]
                ]
                parts.append(f'"armors": [{", ".join(armors)}]')
            else:
                parts.append('"label": null')
            if b.located[i]:
                parts.append(
                    f'"location": [{", ".join(_fmt(v) for v in b.location[i])}]'
                )
            else:
                parts.append('"location": null')
            parts.append(
                f'"track_state": "{state_names[int(b.track_state[i])]}"'
            )
            rows.append("{" + ", ".join(parts) + "}")
        return (
            f"RobotBatch({len(rows)}/{b.valid.shape[0]} valid: ["
            + ", ".join(rows)
            + "])"
        )

    def __repr__(self) -> str:
        try:
            return self.summary()
        except Exception:
            return (
                f"RobotBatch(capacity={self.rect.shape[-2] if self.rect.ndim > 1 else '?'}, "
                f"rect={getattr(self.rect, 'shape', None)})"
            )


@dataclasses.dataclass
class Frame:
    """Host-side input frame: an image, a point cloud and a timestamp.

    Equivalent to the reference ``Frame`` (samples/frame.h:27-84). The image
    is uint8 HWC in BGR channel order (matching cv::imread); the point cloud
    is float32 [N, 3] in millimeters; the timestamp is float seconds.
    """

    image: Optional[np.ndarray] = None
    point_cloud: Optional[np.ndarray] = None
    timestamp: Optional[float] = None
