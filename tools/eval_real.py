#!/usr/bin/env python
"""Accuracy evaluation on the REAL match frames bundled with the reference.

The reference's accuracy claim is real match data (reference README.md:25:
83.66% season marking accuracy) and its assets/images/0..9.jpg are real
2592x2048 arena frames (samples/main.cpp:74-85). This tool evaluates the
trained cascade against the hand-annotated ground truth in
assets/labels/real_frames.json (70 car boxes over 10 frames; 50 with legible
number-plate labels; one ambiguous cluster per frame marked ignore) and
reports car precision/recall, mAP@.5 / mAP@[.5:.95], per-class label
accuracy on the labeled subset, and team (color) accuracy.

These frames are from a different camera/arena than the synthetic training
distribution — the honest real-domain number, not a tuned benchmark. The
regression gate lives in tests/test_accuracy_real.py.

Usage: python tools/eval_real.py [--cpu] [--variant m] [--car-input 512]
       [--armor-size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eval_synth import iou_xywh  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLUE = {0, 1, 2, 3, 4, 10}


def load_frames(image_dir: str, frame_ids=None):
    """``frame_ids``: optional set of int frame ids (e.g. the held-out
    split of tools/train_real.py); None = all 10."""
    from PIL import Image

    labels = json.load(
        open(os.path.join(REPO, "assets/labels/real_frames.json"))
    )
    frames = []
    for name, boxes in sorted(labels["frames"].items()):
        if frame_ids is not None and (
            int(os.path.splitext(name)[0]) not in frame_ids
        ):
            continue
        path = os.path.join(image_dir, name)
        rgb = np.asarray(Image.open(path).convert("RGB"))
        bgr = np.ascontiguousarray(rgb[..., ::-1])  # cv::imread order
        frames.append((name, bgr, boxes))
    return frames


def _inter_over_det(det_xywh, ign_xywh) -> float:
    """Fraction of the detection's area inside the ignore box."""
    dx, dy, dw, dh = det_xywh
    ix, iy, iw, ih = ign_xywh
    ox = max(0.0, min(dx + dw, ix + iw) - max(dx, ix))
    oy = max(0.0, min(dy + dh, iy + ih) - max(dy, iy))
    return ox * oy / max(dw * dh, 1e-9)


def evaluate(
    detector,
    frames,
    iou_thresh: float = 0.5,
    tiled: bool = False,
    dump_path: str = "",
    stage: str = "cascade",
) -> dict:
    """Greedy confidence-ordered matching per frame with ignore-region
    semantics (a detection matching only an ignore box is dropped from both
    TP and FP counts, the standard crowd-region convention).

    ``tiled=True`` runs the car stage on native-resolution tiles
    (RobotDetector.detect_tiled) — the scale-matched mode for these frames,
    whose median robot is 62 px in 2592x2048 (= ~12 px letterboxed to 512,
    outside any trained object-scale distribution)."""
    import jax

    per_frame = []
    for name, image, boxes in frames:
        if stage == "car":
            # Car stage alone (Detections, confidence = the CAR model's own
            # score): isolates tiled car-detection quality from the armor
            # classifier — the cascade's same-label dedup keeps one robot
            # per armor label (reference detector.cpp:431-450), so a
            # misclassifying armor model collapses cascade recall even when
            # every robot was found (measured round 5, PERF.md).
            car = detector.car
            d = jax.device_get(
                car.detect_tiled(image) if tiled else car.detect(image)
            )
            dets = [
                (
                    float(d.confidence[i]),
                    np.asarray(d.xywh[i], np.float64),
                    False,
                    -1,
                )
                for i in range(len(d.valid))
                if d.valid[i]
            ]
            gts = [b for b in boxes if not b["ignore"]]
            igns = [b for b in boxes if b["ignore"]]
            per_frame.append((name, dets, gts, igns))
            continue
        rb = detector.detect_tiled(image) if tiled else detector.detect(image)
        host = jax.device_get(rb)
        dets = [
            (
                float(host.confidence[i]),
                np.asarray(host.rect[i], np.float64),
                bool(host.detected[i]),
                int(host.label[i]),
            )
            for i in range(len(host.valid))
            if host.valid[i]
        ]
        gts = [b for b in boxes if not b["ignore"]]
        igns = [b for b in boxes if b["ignore"]]
        per_frame.append((name, dets, gts, igns))

    n_gt = sum(len(g) for _, _, g, _ in per_frame)
    rows = []  # (conf, frame_idx, det_idx)
    for f, (_, dets, _, _) in enumerate(per_frame):
        rows.extend((conf, f, i) for i, (conf, *_r) in enumerate(dets))
    rows.sort(key=lambda r: -r[0])

    def match_all(iou_t: float):
        """-> (tp flags per row, ignored flags per row, match info)."""
        used = [np.zeros(len(g), bool) for _, _, g, _ in per_frame]
        tp = np.zeros(len(rows))
        ignored = np.zeros(len(rows), bool)
        matches = []  # (frame, det_idx, gt)
        for k, (_c, f, i) in enumerate(rows):
            rect = per_frame[f][1][i][1]
            gts = per_frame[f][2]
            best_j, best_v = -1, iou_t
            for j, gt in enumerate(gts):
                if used[f][j]:
                    continue
                v = iou_xywh(rect, gt["xywh"])
                if v >= best_v:
                    best_j, best_v = j, v
            if best_j >= 0:
                used[f][best_j] = True
                tp[k] = 1.0
                matches.append((f, i, gts[best_j]))
                continue
            for ig in per_frame[f][3]:
                # Crowd-region convention (COCO iscrowd): an unmatched
                # detection is dropped from both TP and FP when MOST OF THE
                # DETECTION lies inside the ignore region — intersection /
                # det area, not IoU (a small det inside a large ignore box
                # has tiny IoU but is exactly the case the region marks).
                if _inter_over_det(rect, ig["xywh"]) >= 0.5:
                    ignored[k] = True
                    break
        return tp, ignored, matches

    def ap(iou_t: float) -> float:
        tp, ignored, _ = match_all(iou_t)
        keep = ~ignored
        tpk = tp[keep]
        if n_gt == 0 or len(tpk) == 0:
            return float("nan")
        ctp = np.cumsum(tpk)
        recall = ctp / n_gt
        precision = ctp / (np.arange(len(tpk)) + 1)
        prec_env = np.maximum.accumulate(precision[::-1])[::-1]
        r_prev = 0.0
        out = 0.0
        for k in range(len(tpk)):
            out += (recall[k] - r_prev) * prec_env[k]
            r_prev = recall[k]
        return float(out)

    tp, ignored, matches = match_all(iou_thresh)
    if dump_path:
        matched = {(f, i) for f, i, _ in matches}
        dump = {}
        for f, (name, dets, gts, igns) in enumerate(per_frame):
            dump[name] = {
                "detections": [
                    {
                        "xywh": [round(float(v), 1) for v in rect],
                        "conf": round(conf, 3),
                        "label": label,
                        "armor_detected": det_flag,
                        "matched": (f, i) in matched,
                        "best_gt_iou": round(
                            max(
                                (iou_xywh(rect, g["xywh"]) for g in gts),
                                default=0.0,
                            ),
                            3,
                        ),
                    }
                    for i, (conf, rect, det_flag, label) in enumerate(dets)
                ],
                "gt": gts,
            }
        json.dump(dump, open(dump_path, "w"), indent=1)
        print(f"dumped per-frame detections to {dump_path}", file=sys.stderr)
    n_det = int((~ignored).sum())
    n_tp = int(tp[~ignored].sum())
    label_hits = label_total = 0
    team_hits = team_total = 0
    detected_flags = 0
    for f, i, gt in matches:
        conf, rect, det_flag, label = per_frame[f][1][i]
        detected_flags += bool(det_flag)
        if gt["label"] is not None:
            label_total += 1
            label_hits += int(det_flag and label == gt["label"])
        if gt["team"] is not None:
            team_total += 1
            pred_blue = label in BLUE
            team_hits += int(
                det_flag and pred_blue == (gt["team"] == "blue")
            )
    thresholds = np.arange(0.5, 0.951, 0.05)
    aps = [ap(float(t)) for t in thresholds]
    return {
        "n_gt_cars": n_gt,
        "n_detections": n_det,
        "car_precision": round(n_tp / max(n_det, 1), 4),
        "car_recall": round(n_tp / max(n_gt, 1), 4),
        "armor_detected_rate": (
            round(detected_flags / n_tp, 4) if n_tp else 0.0
        ),
        "label_accuracy": round(label_hits / max(label_total, 1), 4),
        "n_labeled_matched": label_total,
        "team_accuracy": round(team_hits / max(team_total, 1), 4),
        "n_team_matched": team_total,
        "map_50": round(aps[0], 4),
        "map_50_95": round(float(np.mean(aps)), 4),
    }


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--variant", default="m")
    ap_.add_argument("--car-input", type=int, default=512)
    ap_.add_argument("--armor-size", type=int, default=256)
    ap_.add_argument("--max-cars", type=int, default=8)
    ap_.add_argument("--weights", default=os.path.join(REPO, "assets/models"))
    ap_.add_argument(
        "--images", default="/root/reference/assets/images"
    )
    ap_.add_argument("--conf", type=float, default=None,
                     help="override car conf_thresh")
    ap_.add_argument("--suffix", default="",
                     help="checkpoint-name suffix (e.g. '_r4') to evaluate "
                     "retrain candidates saved with train_synth --suffix "
                     "without renaming the shipped files")
    ap_.add_argument("--cpu", action="store_true")
    ap_.add_argument("--tiled", action="store_true",
                     help="tiled car stage at native resolution (tile = "
                     "car input size, overlap 192)")
    ap_.add_argument("--frames", default="",
                     help="comma-separated frame ids to evaluate (e.g. "
                     "'5,6,7,8,9' for the train_real.py held-out split); "
                     "empty = all 10")
    ap_.add_argument("--car-npz", default="",
                     help="explicit car checkpoint path (overrides the "
                     "variant/size naming, e.g. a train_real.py output)")
    ap_.add_argument("--armor-npz", default="",
                     help="explicit armor checkpoint path")
    ap_.add_argument("--dump", default="",
                     help="write per-frame detections + GT to this JSON "
                     "path (failure analysis)")
    ap_.add_argument("--stage", choices=["cascade", "car"], default="cascade",
                     help="'car' evaluates the car detector alone (no armor "
                     "stage, no same-label dedup) — the per-stage metric")
    args = ap_.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector
    from rm_radar_tpu.models.weights import load_variables

    car_suffix = "" if args.car_input == 640 else f"_{args.car_input}"
    armor_suffix = "" if args.armor_size == 640 else f"_{args.armor_size}"
    car_suffix += args.suffix
    armor_suffix += args.suffix
    car_v = load_variables(
        args.car_npz
        or os.path.join(
            args.weights, f"car_synth_{args.variant}{car_suffix}.npz"
        )
    )
    armor_v = load_variables(
        args.armor_npz
        or os.path.join(
            args.weights, f"armor_synth_{args.variant}{armor_suffix}.npz"
        )
    )
    cfg = RobotDetectorConfig(
        max_cars=args.max_cars,
        input_width=args.car_input,
        input_height=args.car_input,
        armor_input_width=args.armor_size,
        armor_input_height=args.armor_size,
    )
    if args.conf is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, car_conf_thresh=args.conf)
    det = RobotDetector(
        cfg,
        car_variant=args.variant,
        armor_variant=args.variant,
        car_variables=car_v,
        armor_variables=armor_v,
    )
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ids = (
        {int(x) for x in args.frames.split(",")} if args.frames else None
    )
    frames = load_frames(args.images, ids)
    metrics = evaluate(
        det, frames, tiled=args.tiled, dump_path=args.dump, stage=args.stage
    )
    print(json.dumps(metrics, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
