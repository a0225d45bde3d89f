"""Visualization smoke test: draw_robots annotates without touching pixels
outside boxes and saves a PNG."""

import numpy as np

from rm_radar_tpu.pipeline import Robot
from rm_radar_tpu.types import TrackState
from rm_radar_tpu.utils.visualize import draw_robots


def test_draw_robots(tmp_path):
    img = np.zeros((120, 160, 3), np.uint8)
    robots = [
        Robot(
            rect=np.array([20.0, 30.0, 40.0, 30.0]),
            label=3,
            confidence=0.9,
            armors=np.array([[25.0, 35.0, 10.0, 8.0, 3.0, 0.9]]),
            location=np.array([1.0, 2.0, 0.5]),
            track_state=TrackState.CONFIRMED,
        ),
        Robot(rect=np.array([100.0, 10.0, 30.0, 30.0])),  # undetected
    ]
    path = tmp_path / "vis.png"
    out = draw_robots(img, robots, save_path=str(path))
    assert out.shape == (120, 160, 3)
    assert path.exists()
    assert out.sum() > 0  # something was drawn
    # far corner untouched
    assert out[110:, :10].sum() == 0
