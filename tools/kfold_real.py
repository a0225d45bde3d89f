#!/usr/bin/env python
"""K-fold few-shot adaptation protocol over the 10 bundled real frames.

The single 0-4/5-9 split (tools/train_real.py) is one sequence cut one
way; this wrapper re-runs the car-stage finetune over 5 folds (eval frames
{2k, 2k+1}, train = the other 8) and reports the mean and range of the
held-out CAR-STAGE metrics, so the adaptation number carries error bars
(VERDICT r4 next-step #8).

Car stage only, deliberately: the armor finetune's supervision
(tools/train_armor_real.py) uses the plate labels of its train split —
re-using one armor checkpoint across folds would leak eval-frame plates
into training for the folds whose eval frames it saw. Retraining armor per
fold would be leak-free but measures the same thing through a noisier
channel; the car stage is where the domain gap lives (PERF.md round-5:
car-stage recall 0.94 vs cascade 0.66, the difference being armor-label
dedup, not detection).

Usage:
  python tools/kfold_real.py [--steps 3000] [--out /tmp/kfold.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, log_path):
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    if p.returncode != 0:
        raise SystemExit(
            f"command failed rc={p.returncode}: {' '.join(cmd)} "
            f"(log: {log_path})"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="m")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--assigner", default="center")
    ap.add_argument("--workdir", default="/tmp/kfold_real")
    ap.add_argument("--out", default="/tmp/kfold_real/kfold.json")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    folds = []
    for k in range(5):
        eval_ids = [2 * k, 2 * k + 1]
        train_ids = [i for i in range(10) if i not in eval_ids]
        name = f"car_fold{k}.npz"
        ckpt = os.path.join(args.workdir, name)
        print(
            f"fold {k}: train {train_ids} eval {eval_ids}",
            file=sys.stderr, flush=True,
        )
        run(
            [
                sys.executable, "tools/train_real.py",
                "--variant", args.variant, "--size", str(args.size),
                "--steps", str(args.steps), "--synth-frac", "0.5",
                "--assigner", args.assigner,
                "--init",
                f"assets/models/car_synth_{args.variant}_{args.size}_r4.npz",
                "--train-frames", ",".join(map(str, train_ids)),
                "--out", args.workdir, "--name", name,
            ],
            os.path.join(args.workdir, f"train_fold{k}.log"),
        )
        out_path = os.path.join(args.workdir, f"eval_fold{k}.json")
        run(
            [
                sys.executable, "tools/eval_real.py", "--tiled",
                "--stage", "car", "--max-cars", "20",
                "--frames", ",".join(map(str, eval_ids)),
                "--car-npz", ckpt,
            ],
            out_path,
        )
        # eval log = stderr noise + the JSON; take the last JSON object.
        text = open(out_path).read()
        m = json.loads(text[text.index("{"):])
        m["fold"] = k
        m["eval_frames"] = eval_ids
        folds.append(m)
        print(f"fold {k}: {m}", file=sys.stderr, flush=True)

    summary = {"folds": folds}
    for key in ("car_recall", "car_precision", "map_50", "map_50_95"):
        vals = [f[key] for f in folds]
        summary[key] = {
            "mean": round(float(np.mean(vals)), 4),
            "min": round(min(vals), 4),
            "max": round(max(vals), 4),
        }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "folds"},
                     indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
