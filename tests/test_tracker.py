"""Tracker lifecycle tests (reference src/track/tracker.cpp behavior):
spawn on detected+located robots, confirm after init_thresh hits, delete
tentative-on-miss and confirmed after miss_thresh misses, gate rejection,
and setTrack label/location propagation.
"""

import numpy as np

from rm_radar_tpu.configs import TrackerConfig
from rm_radar_tpu.track.tracker import RobotObservation, Tracker
from rm_radar_tpu.types import TrackState

CFG = TrackerConfig(class_num=3)


def _robot(loc, label=0, detected=True):
    feat = np.zeros(3, np.float32)
    if detected and label is not None:
        feat[label] = 1.0
    return RobotObservation(
        detected=detected,
        located=loc is not None,
        label=label if detected else None,
        feature=feat,
        location=None if loc is None else np.asarray(loc, np.float32),
    )


def test_spawn_requires_detected_and_located():
    tr = Tracker(CFG)
    tr.update([_robot(None, label=0)], 0.0)  # not located
    assert len(tr.tracks) == 0
    tr.update([_robot([1.0, 2.0, 0.0], detected=False, label=None)], 0.1)
    assert len(tr.tracks) == 0
    tr.update([_robot([1.0, 2.0, 0.0])], 0.2)
    assert len(tr.tracks) == 1
    assert tr.tracks[0].is_tentative


def test_confirmation_after_init_thresh():
    tr = Tracker(CFG)
    loc = [1.0, 2.0, 0.0]
    tr.update([_robot(loc)], 0.0)  # spawn (init_count 0)
    for i in range(CFG.init_thresh):
        robot = _robot(loc)
        tr.update([robot], 0.1 * (i + 1))
    assert tr.tracks[0].is_confirmed
    assert robot.track_state == TrackState.CONFIRMED
    # Confirmed track overwrites label and location (robot.cpp:81-94).
    assert robot.label == 0
    np.testing.assert_allclose(robot.location, loc, atol=0.2)


def test_tentative_track_deleted_on_single_miss():
    tr = Tracker(CFG)
    tr.update([_robot([1.0, 2.0, 0.0])], 0.0)
    assert len(tr.tracks) == 1
    tr.update([], 0.1)  # no observations -> tentative deleted
    assert len(tr.tracks) == 0


def test_confirmed_track_survives_misses_until_thresh():
    tr = Tracker(CFG)
    loc = [1.0, 2.0, 0.0]
    for i in range(CFG.init_thresh + 1):
        tr.update([_robot(loc)], 0.1 * i)
    assert tr.tracks[0].is_confirmed
    for i in range(CFG.miss_thresh - 1):
        tr.update([], 1.0 + 0.1 * i)
        assert len(tr.tracks) == 1
    tr.update([], 5.0)
    assert len(tr.tracks) == 0


def test_gate_rejects_far_and_different_label():
    cfg = TrackerConfig(class_num=3, init_thresh=1)
    tr = Tracker(cfg)
    tr.update([_robot([0.0, 0.0, 0.0], label=0)], 0.0)
    first_id = tr.tracks[0].track_id
    # A robot far away (> 2 * distance_thresh) with a different label must
    # not match (tracker.cpp:165-170); the unmatched tentative track dies and
    # the robot spawns a fresh track.
    tr.update([_robot([10.0, 10.0, 0.0], label=1)], 0.1)
    assert len(tr.tracks) == 1
    assert tr.tracks[0].track_id != first_id
    assert tr.tracks[0].is_tentative


def test_gate_accepts_far_with_same_label():
    # Reference gate rejects only when BOTH criteria fail: same label passes
    # even when far, so the match updates (and here confirms) the old track.
    cfg = TrackerConfig(class_num=3, init_thresh=1)
    tr = Tracker(cfg)
    tr.update([_robot([0.0, 0.0, 0.0], label=0)], 0.0)
    first_id = tr.tracks[0].track_id
    tr.update([_robot([10.0, 10.0, 0.0], label=0)], 0.1)
    assert len(tr.tracks) == 1
    assert tr.tracks[0].track_id == first_id
    assert tr.tracks[0].is_confirmed


def test_track_follows_moving_target():
    cfg = TrackerConfig(class_num=3, init_thresh=2)
    tr = Tracker(cfg)
    for i in range(8):
        loc = [0.1 * i, 0.0, 0.0]
        robot = _robot(loc)
        tr.update([robot], 0.1 * i)
    assert len(tr.tracks) == 1
    assert tr.tracks[0].is_confirmed
    np.testing.assert_allclose(tr.tracks[0].location(), [0.7, 0.0, 0.0], atol=0.1)
