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
    """Easy tier: gates at measured-minus-noise. The 48/128-scene sweeps
    measure P/R/label 1.0/0.995-1.0 (PERF.md accuracy table); 0.97 on
    ~36 cars allows a single miss and catches a 2-point regression (the
    old 0.75-0.85 gates would have shipped a 20-point one green)."""
    from eval_synth import evaluate, make_eval_scenes

    scenes = make_eval_scenes(12, seed=4242)
    m = evaluate(cascade, scenes)
    assert m["n_gt_cars"] >= 24, m
    assert m["car_recall"] >= 0.97, m
    assert m["car_precision"] >= 0.97, m
    assert m["armor_detected_rate"] >= 0.97, m
    assert m["label_accuracy"] >= 0.97, m
    assert m["map_50"] >= 0.95, m


@pytest.mark.slow
def test_cascade_hard_tier_has_headroom(cascade):
    """Hard tier (occlusion / truncation / blur / lighting / distractor
    cars, plus AIMED car-over-plate occlusion since the round-3 hardening):
    the metrics must sit strictly inside (0, 1) — a saturated eval cannot
    detect regressions — with floors that catch real degradation.

    History: the first hard tier saturated after BOTH stages were hard-mix
    retrained (every metric 1.0 on these 12 scenes — the ceiling alarm below
    fired, as designed). The durable fix is an eval-only difficulty axis the
    armor stage structurally cannot train through: ~35% of later-placed hard
    cars are aimed to cover 0.3-0.85 of an earlier car's plate
    (train/synth.py::make_scene) — armor training uses single-car canvases,
    so a mostly-covered glyph stays irreducibly ambiguous.

    Measured with the checked-in hard-mix yolov8n weights on the hardened
    tier, 12 scenes / 39 cars: precision 0.909, recall 0.769, armor
    detected 0.967, label 0.900 (visible-only 0.963), mAP@[.5:.95] 0.558.
    Floors sit ~3-4 moved boxes below measured (one box is ~0.03)."""
    from eval_synth import evaluate, make_eval_scenes

    scenes = make_eval_scenes(12, seed=1000, hard=True)
    m = evaluate(cascade, scenes)
    assert m["n_gt_cars"] >= 24, m
    # Floors: regression alarms.
    assert m["car_precision"] >= 0.78, m  # distractor-fix regression alarm
    assert m["map_50_95"] >= 0.45, m
    assert m["car_recall"] >= 0.65, m
    assert m["label_accuracy"] >= 0.75, m
    assert m["label_accuracy_visible"] >= 0.85, m
    # Ceilings: saturation alarms — if the hard tier's discriminative
    # metrics ever read ~1.0 it has stopped being a hard tier and must be
    # hardened further.
    assert m["map_50_95"] <= 0.90, m
    assert m["car_recall"] <= 0.97, m
    assert m["label_accuracy"] <= 0.97, m


@pytest.mark.slow
def test_hard_metrics_move_under_ablation():
    """The hard-tier metric must MOVE when the model is degraded (the
    saturated easy tier does not): crushing the armor stage to a 128 px
    input with the 640-trained weights must drop label accuracy."""
    from eval_synth import evaluate, make_eval_scenes

    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector
    from rm_radar_tpu.models.weights import load_variables

    car_v = load_variables(os.path.join(WEIGHTS_DIR, "car_synth_n.npz"))
    armor_v = load_variables(os.path.join(WEIGHTS_DIR, "armor_synth_n.npz"))

    def build(armor_size):
        return RobotDetector(
            RobotDetectorConfig(
                max_cars=8,
                armor_input_width=armor_size,
                armor_input_height=armor_size,
            ),
            car_variant="n",
            armor_variant="n",
            car_variables=car_v,
            armor_variables=armor_v,
            dtype=jnp.float32,
        )

    scenes = make_eval_scenes(6, seed=2000, hard=True)
    good = evaluate(build(640), scenes)
    bad = evaluate(build(128), scenes)
    assert good["n_gt_cars"] >= 10, good
    assert (
        bad["label_accuracy"] <= good["label_accuracy"] - 0.15
        or bad["armor_detected_rate"] <= good["armor_detected_rate"] - 0.15
    ), (good, bad)
