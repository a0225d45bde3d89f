"""rm_radar_tpu — a TPU-native rebuild of the RoboMaster radar perception
stack (reference: zmsbruce/rm_radar, C++/CUDA/TensorRT/PCL).

Three pipeline stages, re-designed for JAX/XLA/Pallas on TPU:

* ``detect``  — two-stage YOLOv8 cascade (car → armor) with fused letterbox
  preprocessing and masked all-pairs NMS, batched instead of stream-juggled.
* ``locate``  — LiDAR point-cloud → depth-image projection via deterministic
  scatter-max, background modeling, on-device Euclidean clustering and
  per-robot depth search.
* ``track``   — Singer-model EKF + auction-algorithm data association,
  SORT-style lifecycle management.

Everything between stages stays on device; collections are fixed-capacity
struct-of-arrays with validity masks instead of dynamic shapes.
"""

from . import configs, geometry, types
from .configs import (
    Calibration,
    DetectorConfig,
    LocatorConfig,
    RadarConfig,
    RobotDetectorConfig,
    TrackerConfig,
)
from .types import Detections, Frame, Label, RobotBatch, TrackState

__version__ = "0.1.0"

__all__ = [
    "configs",
    "geometry",
    "types",
    "Calibration",
    "DetectorConfig",
    "LocatorConfig",
    "RadarConfig",
    "RobotDetectorConfig",
    "TrackerConfig",
    "Detections",
    "Frame",
    "Label",
    "RobotBatch",
    "TrackState",
]
