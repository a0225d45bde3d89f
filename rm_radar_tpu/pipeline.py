"""End-to-end radar pipeline: detect + locate on device, track on host.

Equivalent of the reference sample app (samples/sample_radar.h:106-127),
which overlaps `detect` (GPU) and `update+cluster` (CPU threads) with
std::async, then joins for `search` and `update`. On TPU the overlap problem
disappears: detect and locate are ONE fused jit program — XLA schedules the
YOLO cascade and the point-cloud pipeline together on the same chip with no
host round-trip in between. The only device->host transfer per frame is the
compact RobotBatch (a few KB), after which the branch-heavy SORT lifecycle
runs on host exactly where it belongs.

Multi-camera scale-out: `run_batch` vmaps the fused step over a camera batch;
`parallel.mesh` shards that batch across TPU chips over ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import RadarConfig
from .detect.detector import RobotDetector
from .locate import locator as locate_mod
from .locate.locator import Locator, LocatorState
from .track.tracker import RobotObservation, Tracker
from .types import Frame, RobotBatch, TrackState
from .utils.io import pad_points


@dataclasses.dataclass
class Robot:
    """Host-side fused robot record (reference src/robot/robot.h:53-164)."""

    rect: Optional[np.ndarray] = None  # [4] xywh full-image pixels
    label: Optional[int] = None
    confidence: Optional[float] = None
    armors: Optional[np.ndarray] = None  # [A, 6] x,y,w,h,label,conf
    location: Optional[np.ndarray] = None  # [3] meters
    track_state: Optional[TrackState] = None

    @property
    def is_detected(self) -> bool:
        return self.armors is not None and len(self.armors) > 0

    @property
    def is_located(self) -> bool:
        return self.location is not None

    @property
    def is_tracked(self) -> bool:
        return self.track_state is not None


class Radar:
    """Full pipeline owner (SampleRadar equivalent)."""

    def __init__(
        self,
        config: RadarConfig | None = None,
        car_variant: str = "m",
        armor_variant: str = "m",
        car_variables: Any = None,
        armor_variables: Any = None,
        dtype: Any = jnp.bfloat16,
    ):
        self.config = config or RadarConfig()
        self.detector = RobotDetector(
            self.config.detector,
            car_variant,
            armor_variant,
            car_variables,
            armor_variables,
            dtype,
        )
        self.locator = Locator(self.config.locator, self.config.calibration)
        self.tracker = Tracker(self.config.tracker)
        self._jitted = {}

    # ---------------------------------------------------------------- fused

    def _frame_fn(
        self, state: LocatorState, image, points
    ) -> tuple[RobotBatch, LocatorState]:
        """One fused device step: cascade detect + locate update/cluster/search."""
        robots = self.detector.detect_fn(image)
        state, diff = locate_mod.update(
            state, points, self.locator.calib, self.config.locator
        )
        fg = locate_mod.cluster(diff, self.locator.calib, self.config.locator)
        robots = locate_mod.search(
            robots, fg, self.locator.calib, self.config.locator
        )
        return robots, state

    def _get_jitted(self, key, fn):
        if key not in self._jitted:
            self._jitted[key] = jax.jit(fn, donate_argnums=(0,))
        return self._jitted[key]

    # ----------------------------------------------------------------- host

    def update_background_cloud(self, cloud: np.ndarray) -> None:
        """Prime the background depth model from a pre-recorded cloud
        (SampleRadar::updateBackgroundCloud, sample_radar.h:90-99)."""
        self.locator.update(cloud)

    def run_once(self, frame: Frame) -> List[Robot]:
        """Process one frame end-to-end; returns host Robot records."""
        image = np.ascontiguousarray(frame.image)
        points = pad_points(
            frame.point_cloud
            if frame.point_cloud is not None
            else np.zeros((0, 3), np.float32),
            self.config.locator.max_points,
        )
        step = self._get_jitted(
            ("frame", image.shape), self._frame_fn
        )
        batch, self.locator.state = step(self.locator.state, image, points)
        return self._track_and_collect(batch, frame.timestamp or 0.0)

    def _track_and_collect(
        self, batch: RobotBatch, timestamp: float
    ) -> List[Robot]:
        """Fetch the compact RobotBatch, run the host tracker, and assemble
        reference-style Robot records."""
        host = jax.tree_util.tree_map(np.asarray, batch)
        class_num = self.config.tracker.class_num
        feats = np.asarray(batch.feature(class_num))

        robots: List[Robot] = []
        observations: List[RobotObservation] = []
        for i in range(host.valid.shape[0]):
            if not host.valid[i]:
                continue
            det = bool(host.detected[i])
            locd = bool(host.located[i])
            obs = RobotObservation(
                detected=det,
                located=locd,
                label=int(host.label[i]) if det else None,
                feature=feats[i],
                location=host.location[i].copy() if locd else None,
            )
            armor_rows = None
            if det:
                am = host.armor_valid[i]
                armor_rows = np.concatenate(
                    [
                        host.armor_xywh[i][am],
                        host.armor_label[i][am, None].astype(np.float32),
                        host.armor_conf[i][am, None],
                    ],
                    axis=-1,
                )
            robots.append(
                Robot(
                    rect=host.rect[i].copy(),
                    label=int(host.label[i]) if det else None,
                    confidence=float(host.confidence[i]) if det else None,
                    armors=armor_rows,
                )
            )
            observations.append(obs)

        self.tracker.update(observations, timestamp)

        for robot, obs in zip(robots, observations):
            robot.label = obs.label
            robot.location = (
                None if obs.location is None else np.asarray(obs.location)
            )
            robot.track_state = (
                TrackState(obs.track_state)
                if obs.track_state != TrackState.NONE
                else None
            )
        return robots
