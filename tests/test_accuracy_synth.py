"""End-to-end accuracy gate with REAL (trained) weights.

Runs the full two-stage cascade with the checked-in synthetic-trained
checkpoints (assets/models/*, produced by tools/train_synth.py on TPU) on
held-out full-camera-resolution scenes, and asserts detection precision/
recall and 12-class label accuracy. This is the framework's stand-in for
the reference's accuracy evidence (README.md:25: 83.66% season marking
accuracy) — the original car.onnx/armor.onnx weight blobs are absent from
the snapshot (.MISSING_LARGE_BLOBS), so the models are trained by the
framework's own train/ stack on procedurally labeled RoboMaster-like scenes
(rm_radar_tpu/train/synth.py).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "models")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS_DIR, "car_synth_n.npz")),
    reason="trained weights not present (run tools/train_synth.py)",
)


@pytest.fixture(scope="module")
def cascade():
    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector
    from rm_radar_tpu.models.weights import load_variables

    return RobotDetector(
        RobotDetectorConfig(max_cars=8),
        car_variant="n",
        armor_variant="n",
        car_variables=load_variables(
            os.path.join(WEIGHTS_DIR, "car_synth_n.npz")
        ),
        armor_variables=load_variables(
            os.path.join(WEIGHTS_DIR, "armor_synth_n.npz")
        ),
        dtype=jnp.float32,
    )


@pytest.mark.slow
def test_cascade_accuracy_on_held_out_scenes(cascade):
    from eval_synth import evaluate, make_eval_scenes

    scenes = make_eval_scenes(4, seed=4242)
    m = evaluate(cascade, scenes)
    assert m["n_gt_cars"] >= 8, m
    assert m["car_recall"] >= 0.85, m
    assert m["car_precision"] >= 0.85, m
    assert m["armor_detected_rate"] >= 0.8, m
    assert m["label_accuracy"] >= 0.75, m
