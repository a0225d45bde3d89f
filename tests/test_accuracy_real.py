"""Regression gates for the REAL-match-frame evaluation tier.

The reference's accuracy evidence is real match data (reference
README.md:25: 83.66% season marking accuracy); its bundled
assets/images/0..9.jpg are ten consecutive real 2592x2048 arena frames
(samples/main.cpp:74-85). This repo's ground truth for them is
assets/labels/real_frames.json (hand-annotated; 70 car boxes + 10 ignore
regions, 50 legible plate labels, 70 team colors).

Two tiers of test:

* Always-on (CPU, fast): the label file's integrity — the eval and the
  finetune tool both consume it, so schema drift or out-of-bounds boxes
  must fail loudly here rather than silently skew the measured numbers.
* Opt-in gate (RM_RADAR_REAL_GATE=1, real TPU, ~minutes): runs
  tools/eval_real.py in a subprocess on the axon device (pytest's conftest
  pins this interpreter to CPU, where the m-cascade is impractical) and
  asserts the measured-minus-margin floors recorded in PERF.md
  ("Real-frame accuracy"). Run on a TPU host:

      RM_RADAR_REAL_GATE=1 python -m pytest tests/test_accuracy_real.py -q
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
LABELS = os.path.join(REPO, "assets", "labels", "real_frames.json")
IMAGES = "/root/reference/assets/images"


def test_label_file_integrity():
    data = json.load(open(LABELS))
    frames = data["frames"]
    assert sorted(frames) == [f"{i}.jpg" for i in range(10)]
    n_boxes = n_ignore = n_labeled = n_team = 0
    for name, boxes in frames.items():
        for b in boxes:
            x, y, w, h = b["xywh"]
            assert w > 0 and h > 0, (name, b)
            assert 0 <= x and x + w <= 2592, (name, b)
            assert 0 <= y and y + h <= 2048, (name, b)
            assert isinstance(b["ignore"], bool)
            n_boxes += 1
            n_ignore += b["ignore"]
            if b["label"] is not None:
                # Labels are reference Label enum values (robot.h:32-45).
                assert 0 <= b["label"] <= 11, (name, b)
                assert not b["ignore"], (name, b)
                n_labeled += 1
            if b["team"] is not None:
                assert b["team"] in ("blue", "red"), (name, b)
                n_team += 1
    # The counts the PERF.md tier is defined over; editing the annotations
    # re-centers the measured floors, so it must not happen silently.
    assert n_boxes - n_ignore == 70
    assert n_labeled == 50
    assert n_team == 70


def test_labels_match_bundled_images():
    if not os.path.isdir(IMAGES):
        pytest.skip("reference assets not mounted")
    names = set(json.load(open(LABELS))["frames"])
    present = {n for n in names if os.path.exists(os.path.join(IMAGES, n))}
    assert present == names


def _run_eval_real(*extra_args):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick the TPU
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "eval_real.py"),
        "--tiled",
        *extra_args,
    ]
    # The axon tunnel's remote-compile RPC occasionally drops mid-stream
    # ("response body closed before all bytes were read", INTERNAL) — a
    # transient of the dev link, not a model/eval failure. Retry once so
    # the gate measures accuracy, not tunnel weather; the second attempt
    # additionally benefits from whatever made it into the compile cache.
    for attempt in range(2):
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=3600,
            cwd=REPO,
        )
        if out.returncode == 0:
            return json.loads(out.stdout)
        transient = (
            "remote_compile" in out.stderr
            or "DEADLINE_EXCEEDED" in out.stderr
            or "UNAVAILABLE" in out.stderr
        )
        if not (transient and attempt == 0):
            break
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout)


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("RM_RADAR_REAL_GATE", "0") != "1",
    reason="real-TPU gate (set RM_RADAR_REAL_GATE=1 on a TPU host)",
)
def test_real_frame_gate_zero_shot_tiled():
    """Zero-shot (synthetic-only arena-domain checkpoints, tiled car stage)
    on all 10 real frames. Measured recall is 0 (the arena-v3 model fires
    on 25-30 px part boxes, not car extents — PERF.md diagnosis), so the
    property gated here is the one that CAN regress: the false-positive
    budget. A renderer change that makes the model hallucinate cars all
    over the real frames trips this before it pollutes the finetune."""
    m = _run_eval_real("--suffix", "_r4")
    assert m["n_gt_cars"] == 70, m
    assert m["n_detections"] <= FLOORS["zero_shot"]["max_detections"], m


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("RM_RADAR_REAL_GATE", "0") != "1",
    reason="real-TPU gate (set RM_RADAR_REAL_GATE=1 on a TPU host)",
)
def test_real_frame_gate_finetuned_heldout():
    """The round-5 few-shot configuration (car + armor finetuned on frames
    0-4, tools/train_real.py + train_armor_real.py) evaluated on the
    HELD-OUT frames 5-9 — the config with signal, gated at
    measured-minus-margin (PERF.md "Round 5 — few-shot adaptation")."""
    m = _run_eval_real(
        "--frames", "5,6,7,8,9",
        "--max-cars", "20",
        "--car-npz", os.path.join(REPO, "assets/models/car_real_m_512.npz"),
        "--armor-npz",
        os.path.join(REPO, "assets/models/armor_real_m_256.npz"),
    )
    f = FLOORS["finetuned_heldout"]
    assert m["n_gt_cars"] == 35, m
    assert m["car_recall"] >= f["car_recall"], m
    assert m["car_precision"] >= f["car_precision"], m
    assert m["map_50"] >= f["map_50"], m
    # Identity evidence (the reference's headline metric is marking
    # accuracy on real data, README.md:25): plate label + team color on
    # the matched cars.
    assert m["label_accuracy"] >= f["label_accuracy"], m
    assert m["team_accuracy"] >= f["team_accuracy"], m


# Centered from the measured round-5 numbers in PERF.md ("Round 5 —
# few-shot adaptation"): cascade on held-out frames 5-9 measured
# P 0.79 / R 0.74 / mAP@.5 0.72 / label 0.95 / team 0.85; floors sit one
# re-measurement's noise below. Zero-shot all-10-frames measured 60
# detections at 0 recall (part-box firing, see PERF.md). See the PERF.md
# section for the honesty caveats (10 consecutive frames of one sequence:
# this measures few-shot adaptation to one camera/arena, not open-world
# generalization).
FLOORS = {
    "zero_shot": {"max_detections": 120},
    "finetuned_heldout": {
        "car_recall": 0.60,
        "car_precision": 0.60,
        "map_50": 0.55,
        "label_accuracy": 0.80,
        "team_accuracy": 0.70,
    },
}
