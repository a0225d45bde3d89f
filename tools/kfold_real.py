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


def run(cmd, log_path, timeout=None, retries=0):
    """Run cmd logging to log_path; bound with timeout and retry.

    The axon dev tunnel's remote-compile RPC can hang indefinitely (a
    fold-0 eval sat 22 min at zero CPU in the round-5 session; the same
    program compiled in ~3 min once restarted). A timeout + one retry
    turns that failure mode from 'protocol dies mid-run' into a bounded
    hiccup. Timeouts are generous multiples of the measured healthy
    durations (train fold ~10 min incl. staging, eval ~4 min).
    """
    for attempt in range(retries + 1):
        with open(log_path, "w") as f:
            try:
                p = subprocess.run(
                    cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
                    timeout=timeout,
                )
            except subprocess.TimeoutExpired:
                print(
                    f"timeout after {timeout}s (attempt {attempt + 1}): "
                    f"{' '.join(cmd)}",
                    file=sys.stderr, flush=True,
                )
                continue
        if p.returncode == 0:
            return
        print(
            f"rc={p.returncode} (attempt {attempt + 1}): {' '.join(cmd)}",
            file=sys.stderr, flush=True,
        )
    raise SystemExit(
        f"command failed after {retries + 1} attempts: {' '.join(cmd)} "
        f"(log: {log_path})"
    )


def _parse_json(path):
    """Last JSON object in a mixed stderr+stdout log, or None."""
    try:
        text = open(path).read()
        return json.loads(text[text.index("{"):])
    except (OSError, ValueError):
        return None


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
        # Resume-friendly: a completed fold's checkpoint / result is
        # reused, so an interrupted protocol (tunnel hang, session end)
        # restarts from where it stopped instead of re-training.
        if not os.path.exists(ckpt):
            run(
                [
                    sys.executable, "tools/train_real.py",
                    "--variant", args.variant, "--size", str(args.size),
                    "--steps", str(args.steps), "--synth-frac", "0.5",
                    "--assigner", args.assigner,
                    "--init",
                    f"assets/models/"
                    f"car_synth_{args.variant}_{args.size}_r4.npz",
                    "--train-frames", ",".join(map(str, train_ids)),
                    "--out", args.workdir, "--name", name,
                ],
                os.path.join(args.workdir, f"train_fold{k}.log"),
                timeout=3600,
                retries=1,
            )
        out_path = os.path.join(args.workdir, f"eval_fold{k}.json")
        if not (os.path.exists(out_path) and _parse_json(out_path)):
            run(
                [
                    sys.executable, "tools/eval_real.py", "--tiled",
                    "--stage", "car", "--max-cars", "20",
                    "--frames", ",".join(map(str, eval_ids)),
                    "--car-npz", ckpt,
                ],
                out_path,
                timeout=1500,
                retries=1,
            )
        m = _parse_json(out_path)
        if m is None:
            raise SystemExit(f"fold {k}: no JSON in {out_path}")
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
