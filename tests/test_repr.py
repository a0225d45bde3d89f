"""Debug-dump parity: the SoA containers print JSON-ish summaries mirroring
the reference's operator<< dumps (src/detect/detection.h:53-60,
src/robot/robot.cpp:124-156, src/track/track.h:172-185,
src/track/features.h:199-203)."""

import jax.numpy as jnp
import numpy as np

from rm_radar_tpu.configs import TrackerConfig
from rm_radar_tpu.track.device_tracker import make_store
from rm_radar_tpu.track.features import Features
from rm_radar_tpu.track.tracker import Track
from rm_radar_tpu.types import Detections, RobotBatch, TrackState


def test_detections_repr():
    det = Detections.empty(4)
    det = det._replace(
        xywh=det.xywh.at[0].set(jnp.asarray([1.0, 2.0, 30.0, 40.0])),
        label=det.label.at[0].set(7),
        confidence=det.confidence.at[0].set(0.9),
        valid=det.valid.at[0].set(True),
    )
    s = repr(det)
    assert '"label": 7' in s and '"confidence": 0.90' in s
    assert s.startswith("Detections(1/4 valid")
    # Batched variant prints counts.
    b = Detections.empty(3, batch_shape=(2,))
    assert "counts=[0, 0]" in repr(b)


def test_robot_batch_repr():
    rb = RobotBatch.empty(3, 2)
    assert "0/3 valid" in repr(rb)
    rb = rb._replace(
        valid=rb.valid.at[1].set(True),
        detected=rb.detected.at[1].set(True),
        label=rb.label.at[1].set(4),
        confidence=rb.confidence.at[1].set(0.75),
        armor_valid=rb.armor_valid.at[1, 0].set(True),
        located=rb.located.at[1].set(True),
        location=rb.location.at[1].set(jnp.asarray([1.0, 2.0, 3.0])),
        track_state=rb.track_state.at[1].set(int(TrackState.CONFIRMED)),
    )
    s = repr(rb)
    assert '"label": 4' in s
    assert '"location": [1.00, 2.00, 3.00]' in s
    assert '"track_state": "confirmed"' in s
    assert '"armors": [' in s


def test_track_store_repr():
    store = make_store(TrackerConfig(max_tracks=5))
    assert "0/5 live" in repr(store)
    store = store._replace(
        state=store.state.at[2].set(int(TrackState.TENTATIVE)),
        track_id=store.track_id.at[2].set(9),
    )
    s = repr(store)
    assert '"id": 9' in s and '"state": "tentative"' in s


def test_track_and_features_repr():
    t = Track.create(np.array([1.0, 2.0, 3.0]), np.eye(12)[3], 0.0, 11)
    s = repr(t)
    assert '"id": 11' in s and '"state": "tentative"' in s and '"label": 3' in s
    f = Features(np.array([0.25, 0.75]))
    s = repr(f)
    assert "size=1" in s and "0.750" in s
