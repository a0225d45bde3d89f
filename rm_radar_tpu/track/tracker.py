"""SORT-style multi-target tracker: Singer EKF + auction association.

Reimplements the reference ``radar::Tracker`` (src/track/tracker.{h,cpp}) and
``radar::Track`` (src/track/track.h) lifecycle:

* predict every track to the frame timestamp (dt in float seconds),
* build a robots x tracks *value* matrix from a distance score and a cosine
  feature score (tracker.cpp:85-118),
* associate with the auction algorithm (tracker.cpp:144),
* gate: an assignment is rejected only when the distance exceeds
  2 * distance_thresh AND the labels differ (tracker.cpp:165-170),
* matched tracks update their EKF + features, tentative tracks confirm after
  init_thresh hits; unmatched tentative tracks delete immediately, confirmed
  tracks delete after miss_thresh misses (tracker.cpp:174-207),
* unmatched robots that are both detected and located spawn new tracks
  (tracker.cpp:210-219).

The track store is host-side (numpy): track counts are tiny (<= ~12) and the
lifecycle is branch-heavy, so the host is the right processor — the reference
reached the same conclusion with its CPU tracker. The EKF algebra runs in
numpy float32 mirroring :mod:`rm_radar_tpu.track.singer` (the jnp version is
the canonical batched implementation; tests assert the two agree).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from ..configs import TrackerConfig
from ..types import TrackState
from .auction import NOT_MATCHED, auction
from .features import Features

_STATE = 9


def _transition_np(dt: float, tau: float) -> np.ndarray:
    f = np.eye(_STATE, dtype=np.float32)
    decay = np.float32(np.exp(-dt / tau))
    for i in range(3):
        f[3 * i, 3 * i + 1] = dt
        f[3 * i, 3 * i + 2] = dt * dt / 2.0
        f[3 * i + 1, 3 * i + 2] = dt
        f[3 * i + 2, 3 * i + 2] = decay
    return f


def _process_noise_np(dt: float, tau: float, max_acc: float) -> np.ndarray:
    e1 = 1.0 - np.exp(-dt / tau)
    e2 = (1.0 - np.exp(-2.0 * dt / tau)) / 2.0
    block = np.array(
        [
            [dt**3 / 3.0, dt**2 / 2.0, dt / 2.0],
            [dt**2 / 2.0, dt, e1],
            [dt / 2.0, e1, e2],
        ],
        dtype=np.float32,
    )
    q = np.zeros((_STATE, _STATE), dtype=np.float32)
    for i in range(3):
        q[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = block
    return q * np.float32(max_acc**2)


@dataclasses.dataclass
class Track:
    """One tracked target (host mirror of reference src/track/track.h)."""

    mean: np.ndarray  # [9] float32
    cov: np.ndarray  # [9, 9] float32
    features: Features
    timestamp: float
    track_id: int
    state: TrackState = TrackState.TENTATIVE
    init_count: int = 0
    miss_count: int = 0

    @staticmethod
    def create(
        location: np.ndarray,
        feature: np.ndarray,
        timestamp: float,
        track_id: int,
    ) -> "Track":
        mean = np.zeros(_STATE, dtype=np.float32)
        mean[0::3] = np.asarray(location, dtype=np.float32)
        cov = np.eye(_STATE, dtype=np.float32) * 0.1
        return Track(
            mean=mean,
            cov=cov,
            features=Features(feature),
            timestamp=float(timestamp),
            track_id=track_id,
        )

    def predict(self, timestamp: float, tau: float, max_acc: float) -> None:
        dt = np.float32(float(timestamp) - self.timestamp)
        f = _transition_np(dt, tau)
        q = _process_noise_np(dt, tau, max_acc)
        self.mean = f @ self.mean
        self.cov = f @ self.cov @ f.T + q
        self.timestamp = float(timestamp)

    def update(self, location: np.ndarray, feature: np.ndarray, obs_noise: np.ndarray) -> None:
        self.features.push_back(feature)
        # H picks (x, y, z) out of the state.
        pht = self.cov[:, 0::3]  # P H^T, [9, 3]
        innovation = pht[0::3, :] + obs_noise  # H P H^T + R
        gain = pht @ np.linalg.inv(innovation)  # [9, 3]
        residual = np.asarray(location, np.float32) - self.mean[0::3]
        self.mean = self.mean + gain @ residual
        ikh = np.eye(_STATE, dtype=np.float32)
        ikh[:, 0::3] -= gain
        self.cov = ikh @ self.cov

    def location(self) -> np.ndarray:
        return self.mean[0::3].copy()

    def label(self) -> int:
        return self.features.label()

    def feature(self) -> np.ndarray:
        return self.features.feature()

    @property
    def is_tentative(self) -> bool:
        return self.state == TrackState.TENTATIVE

    @property
    def is_confirmed(self) -> bool:
        return self.state == TrackState.CONFIRMED

    @property
    def is_deleted(self) -> bool:
        return self.state == TrackState.DELETED

    def __repr__(self) -> str:
        """JSON-ish dump mirroring the reference's
        ``operator<<(std::ostream&, const Track&)`` (src/track/track.h:
        172-185)."""
        loc = self.location()
        return (
            'Track({"id": %d, "state": "%s", "label": %d, '
            '"location": [%.2f, %.2f, %.2f], "init": %d, "miss": %d})'
            % (
                self.track_id,
                self.state.name.lower(),
                self.label(),
                loc[0],
                loc[1],
                loc[2],
                self.init_count,
                self.miss_count,
            )
        )


@dataclasses.dataclass
class RobotObservation:
    """Host-side view of one robot for the tracker.

    ``location`` is in meters (or None when not located); ``feature`` is the
    L1-normalized class-confidence vector (Robot::feature, robot.cpp:102-122).
    """

    detected: bool
    located: bool
    label: Optional[int]
    feature: np.ndarray  # [class_num]
    location: Optional[np.ndarray]  # [3] meters
    # Filled by the tracker (Robot::setTrack semantics, robot.cpp:81-94):
    track_state: TrackState = TrackState.NONE

    def apply_track(self, track: Track) -> None:
        """Robot::setTrack: confirmed tracks overwrite label+location;
        tentative tracks only fill missing fields (robot.cpp:81-94)."""
        self.track_state = track.state
        if track.is_confirmed:
            self.label = track.label()
            self.location = track.location()
        else:
            if self.label is None:
                self.label = track.label()
            if self.location is None:
                self.location = track.location()


class Tracker:
    """Track manager; one instance per camera stream."""

    def __init__(self, config: TrackerConfig | None = None):
        self.config = config or TrackerConfig()
        self.tracks: List[Track] = []
        self._next_id = 0
        self._obs_noise = np.diag(
            np.asarray(self.config.observation_noise, dtype=np.float32)
        )

    def _score(self, track: Track, robot: RobotObservation) -> float:
        """Value-matrix entry (reference tracker.cpp:85-118)."""
        cfg = self.config
        if not robot.located and not robot.detected:
            return 0.0
        if not robot.located:
            distance_score = 0.0
        else:
            d = float(np.linalg.norm(robot.location - track.location()))
            if d < cfg.distance_thresh:
                distance_score = 1.0
            elif d < 2 * cfg.distance_thresh:
                distance_score = -d / cfg.distance_thresh + 2.0
            else:
                distance_score = 0.0
        fr = robot.feature
        ft = track.feature()
        denom = float(np.linalg.norm(fr) * np.linalg.norm(ft))
        if denom == 0.0:
            feature_score = 0.0
        else:
            feature_score = (float(fr @ ft) / denom + 1.0) / 2.0
        return (
            distance_score * cfg.distance_weight
            + feature_score * cfg.feature_weight
        )

    def update(
        self, robots: Sequence[RobotObservation], timestamp: float
    ) -> None:
        """One tracking step (reference tracker.cpp:126-220). Mutates both the
        track store and the robots' track fields."""
        cfg = self.config

        for track in self.tracks:
            track.predict(timestamp, cfg.acceleration_correlation_time, cfg.max_acceleration)

        value = np.zeros((len(robots), len(self.tracks)), dtype=np.float32)
        for ri, robot in enumerate(robots):
            for ti, track in enumerate(self.tracks):
                value[ri, ti] = self._score(track, robot)

        assignment = (
            auction(value, cfg.max_iter)
            if len(robots) and len(self.tracks)
            else np.full(len(robots), NOT_MATCHED)
        )

        unmatched_robots: List[int] = []
        matched_tracks: List[int] = []
        for ri, robot in enumerate(robots):
            if not robot.located:
                unmatched_robots.append(ri)
                continue
            ti = int(assignment[ri])
            if ti == NOT_MATCHED:
                unmatched_robots.append(ri)
                continue
            track = self.tracks[ti]
            # Gate: auction always assigns something; reject only when the
            # match is bad by BOTH criteria (tracker.cpp:165-170).
            d = float(np.linalg.norm(robot.location - track.location()))
            robot_label = robot.label if robot.label is not None else -1
            if d > 2 * cfg.distance_thresh and robot_label != track.label():
                unmatched_robots.append(ri)
                continue
            track.update(robot.location, robot.feature, self._obs_noise)
            if track.is_tentative:
                track.init_count += 1
                if track.init_count >= cfg.init_thresh:
                    track.state = TrackState.CONFIRMED
            track.miss_count = 0
            robot.apply_track(track)
            matched_tracks.append(ti)

        for ti, track in enumerate(self.tracks):
            if ti in matched_tracks:
                continue
            if track.is_tentative:
                track.state = TrackState.DELETED
            elif track.is_confirmed:
                track.miss_count += 1
                if track.miss_count >= cfg.miss_thresh:
                    track.state = TrackState.DELETED

        self.tracks = [t for t in self.tracks if not t.is_deleted]

        for ri in unmatched_robots:
            robot = robots[ri]
            if robot.detected and robot.located:
                track = Track.create(
                    robot.location, robot.feature, timestamp, self._next_id
                )
                self._next_id += 1
                robot.apply_track(track)
                self.tracks.append(track)
