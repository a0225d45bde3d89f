"""Configuration dataclasses for the rm_radar_tpu framework.

Every default below mirrors the published defaults of the reference C++
implementation (zmsbruce/rm_radar), because those defaults *are* the observed
behavior of the system:

* Detector defaults:      reference src/detect/detector.h:87-93
* RobotDetector defaults: reference src/detect/detector.h:173-180
* Locator defaults:       reference src/locate/locator.h:59-65
* Tracker defaults:       reference src/track/tracker.h:25-30
* Sample app constants:   reference samples/sample_radar.h:32-34

Units follow the reference conventions: image coordinates in pixels, LiDAR /
world coordinates in millimeters (converted to meters when a location is
written to a robot), timestamps in float seconds.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np


def _env_int(name: str, default: int) -> int:
    """Validated integer env override (one place, loud failure).

    Config fields that exist for measured A/B knobs take their default from
    the environment so ``tools/ab_batch8.py`` can flip them per-arm without
    code changes; a malformed value raises here, at config construction,
    instead of deep inside a constructor.
    """
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    try:
        return int(raw)
    except ValueError as e:
        raise ValueError(
            f"environment override {name}={raw!r} is not an integer"
        ) from e


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Single-model detector configuration.

    Mirrors the constructor parameters of ``radar::Detector``
    (reference src/detect/detector.h:87-93). The TensorRT-specific knobs
    (opt_batch_size, opt_level, engine caching) have no TPU counterpart;
    their role is played by XLA's jit cache and the persistent compilation
    cache.
    """

    classes: int = 1
    max_batch_size: int = 1
    nms_thresh: float = 0.65
    conf_thresh: float = 0.25
    input_width: int = 640
    input_height: int = 640
    input_channels: int = 3
    # TPU-specific: fixed-capacity outputs (dynamic shapes are not jittable).
    # The number of NMS survivors kept per image after compaction.
    max_detections: int = 32
    # Number of top-confidence candidate boxes entering all-pairs NMS. The
    # reference runs all-pairs NMS over all 8400 anchors (detector.cu:315-360);
    # boxes below conf_thresh are dropped there too, so restricting the
    # pairwise pass to the top-K candidates by confidence is exact whenever
    # fewer than K anchors pass conf_thresh (always true in practice). The
    # postprocess reports the per-image above-threshold anchor count
    # (Detections.n_candidates / RobotBatch.nms_candidates_*) so saturation
    # — the one regime where the top-K pool diverges from the reference's
    # all-pairs NMS — is observable instead of silent.
    nms_top_k: int = 512
    # Banded lowering of the full-frame letterbox resample matmuls: output
    # blocks of N rows contract only their static source band (~8x fewer
    # MXU FLOPs at 2048->512; equal up to ~5e-4 of values flipping one
    # 1/255 quantization-tie step — ops/preprocess._banded_left). 0 = dense.
    # Default 16: the round-3 interleaved batch-8 A/B measured -0.192
    # ms/frame vs dense and the end-to-end accuracy A/B was neutral on both
    # eval tiers (PERF.md). Env override RM_RADAR_LETTERBOX_BAND for A/B.
    letterbox_band: int = dataclasses.field(
        default_factory=lambda: _env_int("RM_RADAR_LETTERBOX_BAND", 16)
    )
    # Tiled (high-resolution) inference. The reference letterboxes the whole
    # 2592x2048 frame to 640 (detector.cpp:124-158), which shrinks a 62 px
    # robot — the median size in its own bundled match frames — to ~15 px,
    # far below the scale any of this repo's synthetic training renders.
    # ``tile > 0`` instead slides a tile x tile window (step tile -
    # tile_overlap) over the source at NATIVE resolution, runs the model on
    # every tile as one batch, and merges via a global class-aware NMS in
    # source coordinates. Detections within ``tile_border_margin`` px of an
    # interior tile edge are dropped before the merge (the neighbor tile
    # sees them whole — guaranteed for objects up to tile_overlap -
    # 2*margin px). 0 = whole-image letterbox (reference parity, default).
    tile: int = 0
    tile_overlap: int = 192
    tile_border_margin: int = 8

    @property
    def num_anchors(self) -> int:
        """YOLOv8 anchor count for the configured input size (8400 at 640)."""
        return sum(
            (self.input_height // s) * (self.input_width // s) for s in (8, 16, 32)
        )


@dataclasses.dataclass(frozen=True)
class RobotDetectorConfig:
    """Two-stage car→armor cascade configuration.

    Mirrors ``radar::RobotDetector`` defaults (reference
    src/detect/detector.h:173-180) and the sample app constants
    kClassNum=12, kMaxBatchSize=20 (samples/sample_radar.h:32-34).
    """

    armor_classes: int = 12
    max_cars: int = 20
    iou_thresh: float = 0.75
    car_nms_thresh: float = 0.65
    car_conf_thresh: float = 0.25
    armor_nms_thresh: float = 0.65
    armor_conf_thresh: float = 0.50
    input_width: int = 640
    input_height: int = 640
    # Armor-stage network input. The reference runs both stages at 640
    # (detector.h:176-178); car crops are typically 100-400 px, so a smaller
    # armor input (e.g. 416 or 320) cuts armor FLOPs quadratically with
    # little information loss — exposed as a knob, 640 by default for parity.
    armor_input_width: int = 640
    armor_input_height: int = 640
    max_armors_per_car: int = 8
    # Static source window for the fused crop resample. The crop einsums
    # contract over the full image extents (2048/2592) although a car crop is
    # a few hundred px; slicing a [window, window] neighborhood first cuts
    # armor-preprocess FLOPs ~6x. Frames where any *valid* car exceeds the
    # window fall back to the full-extent path via one batch-level lax.cond
    # (results are bit-identical either way — tested). 0 disables.
    crop_window: int = 768
    # Car-stage letterbox band lowering (see DetectorConfig.letterbox_band);
    # forwarded to the car stage's DetectorConfig so a RobotDetector can be
    # pinned to a lowering programmatically, not only via the environment.
    letterbox_band: int = dataclasses.field(
        default_factory=lambda: _env_int("RM_RADAR_LETTERBOX_BAND", 16)
    )
    # Per-stage NMS candidate-pool sizes. The round-4 saturation telemetry
    # caught the car stage at 797 above-threshold anchors on the bench's own
    # synthetic-scene workload — past the old 512 pool, i.e. the regime
    # where the top-K approximation of the reference's all-pairs NMS
    # (detector.cu:315-360) stops being provably exact. 1024 restores the
    # margin (the armor stage peaked at 244; 512 keeps its 8-20 vmapped
    # copies cheap). The bench alarms whenever a run approaches either pool.
    car_nms_top_k: int = 1024
    armor_nms_top_k: int = 512
    # Car-stage tiled inference (see DetectorConfig.tile). The armor stage
    # needs no tiling: it crops each car from the ORIGINAL full-resolution
    # image and letterboxes the crop, so its object scale is normalized by
    # construction regardless of how far the robot is.
    car_tile: int = 0
    car_tile_overlap: int = 192
    tile_border_margin: int = 8
    # LiDAR-gated top-K tile selection for the tiled car stage (0 = run the
    # full grid). When > 0, the pipeline scores every tile by the locator's
    # depth-diff foreground and runs the car model only on the K best tiles
    # (detect/tile_select.py — rationale, guarantees and the camera-only-
    # detection trade-off are documented there). Requires a primed
    # background; the bench alarms on uncovered foreground.
    car_tile_topk: int = 0

    def car_config(self) -> DetectorConfig:
        return DetectorConfig(
            classes=1,
            max_batch_size=1,
            nms_thresh=self.car_nms_thresh,
            conf_thresh=self.car_conf_thresh,
            input_width=self.input_width,
            input_height=self.input_height,
            max_detections=self.max_cars,
            letterbox_band=self.letterbox_band,
            nms_top_k=self.car_nms_top_k,
            tile=self.car_tile,
            tile_overlap=self.car_tile_overlap,
            tile_border_margin=self.tile_border_margin,
        )

    def armor_config(self) -> DetectorConfig:
        return DetectorConfig(
            classes=self.armor_classes,
            max_batch_size=self.max_cars,
            nms_thresh=self.armor_nms_thresh,
            conf_thresh=self.armor_conf_thresh,
            input_width=self.armor_input_width,
            input_height=self.armor_input_height,
            max_detections=self.max_armors_per_car,
            letterbox_band=self.letterbox_band,
            nms_top_k=self.armor_nms_top_k,
        )


@dataclasses.dataclass(frozen=True)
class LocatorConfig:
    """LiDAR localization configuration, all lengths in millimeters.

    Mirrors ``radar::Locator`` constructor defaults (reference
    src/locate/locator.h:59-65): zoom_factor=0.5, queue_size=3,
    min/max_depth_diff=500/4000, cluster_tolerance=400, cluster size 8..1000,
    max_distance=29300.
    """

    image_width: int = 2592
    image_height: int = 2048
    zoom_factor: float = 0.5
    queue_size: int = 3
    min_depth_diff: float = 500.0
    max_depth_diff: float = 4000.0
    cluster_tolerance: float = 400.0
    min_cluster_size: int = 8
    max_cluster_size: int = 1000
    max_distance: float = 29300.0
    # TPU-specific fixed capacities.
    max_points: int = 16384  # input cloud capacity (zero-padded)
    # Foreground pixels entering clustering: ~10k-point clouds at 60% FOV
    # coverage yield far fewer foreground pixels than 2048; clusters are
    # capped at 1000 points anyway (max_cluster_size).
    max_foreground: int = 2048
    cc_iterations: int = 10  # label-propagation rounds (with pointer jumping)
    # Foreground compaction strategy for the *candidate-less* cluster(diff)
    # API only. The pipeline (Radar/_frame_fn and Locator.cluster) always
    # supplies the LocatorState's projection queues and uses the point-driven
    # candidate compaction, which bypasses this flag entirely. When cluster()
    # is called with just a diff image: False (default) = dense top_k over
    # negated pixel indices (~2.6 ms at 1.3M px on v5e); True = the Pallas
    # sparse-scan kernel (correct everywhere, but Mosaic's sequential scalar
    # loops make it ~20x slower — measurements in ops/pallas_kernels.py and
    # PERF.md).
    use_pallas_compaction: bool = False
    # Duplicate-removal lowering inside the point-driven candidate
    # compaction (locator._compact_from_candidates). The default,
    # "dedup3_topk", prunes each cloud's candidates to one per pixel at
    # enqueue time (locator.update), which bounds duplicates per pixel to
    # queue_size and lets the per-frame selection drop the M-wide argsort
    # for two top_k passes (M -> Q*n_out -> n_out). Measured -0.328
    # ms/frame vs "sort" in the round-3 interleaved batch-8 A/B at the
    # shipped config. Alternatives, all exactly equivalent (tested):
    # "sort" (argsort the ~30K candidates — the round-2 lowering),
    # "scatter" (owner-table scatter-min; +0.218 ms/frame vs sort),
    # "sort2" (cumsum-rank selection; +0.295 ms/frame vs sort),
    # "dedup3_sort" (enqueue dedup + argsort with a static-slice top_k;
    # -0.023 ms/frame vs sort), "dedup3_pallas" (the round-4 Pallas
    # pre-compactor, ops/pallas_kernels.compact_candidates_pallas: a
    # per-row scan-and-append kernel replaces the M-wide first top_k;
    # exactly equals dedup3_topk, vmap-safe, measured via the same A/B
    # harness). Env override for A/B.
    candidate_compaction: str = dataclasses.field(
        default_factory=lambda: __import__("os").environ.get(
            "RM_RADAR_COMPACTION", "dedup3_topk"
        )
    )
    # Enqueue-time dedup lowering inside update() for the dedup3_* family:
    # "sort" (default) — one argsort of max_points keys per cloud, output
    # pixel-sorted (required by dedup3_pallas); "scatter" — owner-table
    # scatter-min, no argsort, original order (fine for dedup3_topk /
    # dedup3_sort, whose exactness needs only the <=1-per-pixel bound).
    # The argsort is the update stage's dominant op; the round-4 A/B
    # measures whether the ~10K-update scatter beats it at this domain
    # size (the 49K-domain scatter lost in round 3). Env override for A/B.
    enqueue_dedup: str = dataclasses.field(
        default_factory=lambda: __import__("os").environ.get(
            "RM_RADAR_ENQUEUE_DEDUP", "sort"
        )
    )
    # Depth-image ring layout: "stacked" keeps one [Q, H, W] array whose
    # roll re-writes all Q images every frame (a [3, 1024, 1296] f32
    # concatenate = 16 MB of HBM writes); "tuple" stores Q separate [H, W]
    # leaves so the roll is pure pytree re-binding — pass-through leaves
    # alias donated inputs instead of being copied. Bit-identical diffs
    # (tested). Round-3 interleaved batch-8 A/B: tuple -0.009 ms/frame —
    # a wash (the roll is already overlapped/cheap); "stacked" stays the
    # default for layout simplicity.
    queue_layout: str = dataclasses.field(
        default_factory=lambda: __import__("os").environ.get(
            "RM_RADAR_QUEUE_LAYOUT", "stacked"
        )
    )

    @property
    def zoomed_width(self) -> int:
        # int truncation as in reference src/locate/locate.cpp:122
        return int(self.image_width * self.zoom_factor)

    @property
    def zoomed_height(self) -> int:
        return int(self.image_height * self.zoom_factor)


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """SORT-style tracker configuration.

    Mirrors ``radar::Tracker`` constructor defaults (reference
    src/track/tracker.h:25-30): init_thresh=4, miss_thresh=10,
    max_acceleration=2.0 m/s^2, tau=1.0 s, distance_weight=0.4,
    feature_weight=0.6, max_iter=100, distance_thresh=0.8 m.
    """

    class_num: int = 12
    init_thresh: int = 4
    miss_thresh: int = 10
    max_acceleration: float = 2.0
    acceleration_correlation_time: float = 1.0
    distance_weight: float = 0.4
    feature_weight: float = 0.6
    max_iter: int = 100
    distance_thresh: float = 0.8
    # Observation noise (m), per-axis; samples/main.cpp:22 uses (0.4, 0.4, 0.4).
    observation_noise: Tuple[float, float, float] = (0.4, 0.4, 0.4)
    # TPU-specific fixed capacity for the batched on-device track store.
    max_tracks: int = 24


@dataclasses.dataclass(frozen=True)
class Calibration:
    """Camera / LiDAR / world calibration.

    Defaults are the sample calibration hardcoded in the reference sample app
    (samples/main.cpp:12-22): a 2592x2048 camera, its intrinsic matrix, the
    LiDAR→camera extrinsic and the world→camera extrinsic.
    """

    intrinsic: Tuple[Tuple[float, ...], ...] = (
        (1685.51538398561, 0.0, 1278.99324114319),
        (0.0, 1685.26471848220, 1037.21273138299),
        (0.0, 0.0, 1.0),
    )
    lidar_to_camera: Tuple[Tuple[float, ...], ...] = (
        (0.0, -1.0, 0.0, 0.85443),
        (0.0, 0.0, -1.0, -37.6845),
        (1.0, 0.0, 0.0, 12.2631),
        (0.0, 0.0, 0.0, 1.0),
    )
    world_to_camera: Tuple[Tuple[float, ...], ...] = (
        (0.05975021, 0.99807031, 0.01689906, -7179.65399136),
        (0.28962566, -0.00113262, -0.95713933, -4671.34956587),
        (-0.9552732, 0.06208368, -0.28913445, 28286.8920291),
        (0.0, 0.0, 0.0, 1.0),
    )

    def intrinsic_np(self) -> np.ndarray:
        return np.asarray(self.intrinsic, dtype=np.float32)

    def lidar_to_camera_np(self) -> np.ndarray:
        return np.asarray(self.lidar_to_camera, dtype=np.float32)

    def world_to_camera_np(self) -> np.ndarray:
        return np.asarray(self.world_to_camera, dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class RadarConfig:
    """Top-level pipeline configuration (SampleRadar equivalent,
    reference samples/sample_radar.h:41-127)."""

    detector: RobotDetectorConfig = dataclasses.field(
        default_factory=RobotDetectorConfig
    )
    locator: LocatorConfig = dataclasses.field(default_factory=LocatorConfig)
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    calibration: Calibration = dataclasses.field(default_factory=Calibration)
    # Serving-loop bucket de-escalation: after this many consecutive quiet
    # ticks (observed car count <= half the next-smaller bucket) the stream
    # drops one bucket size. 60 ticks ~= 2-6 s at camera rate — long enough
    # that a brief lull doesn't trigger an escalate/de-escalate recompile
    # ping-pong, short enough to shed the larger program's cost within
    # seconds of the scene actually emptying. Env override:
    # RM_RADAR_DEESCALATE_AFTER.
    stream_deescalate_after: int = dataclasses.field(
        default_factory=lambda: _env_int("RM_RADAR_DEESCALATE_AFTER", 60)
    )
