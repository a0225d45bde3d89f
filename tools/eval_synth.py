#!/usr/bin/env python
"""Accuracy evaluation of the trained cascade on held-out synthetic scenes.

Generates full-camera-resolution (2592x2048) RoboMaster-like scenes the
models have never seen (different seed and scale pipeline from training),
runs the fused two-stage cascade, and reports car precision/recall, armor
detection rate and 12-class label accuracy — the framework's stand-in for
the reference's season marking accuracy (reference README.md:25), since the
original car.onnx/armor.onnx blobs are absent from the snapshot.

Also sweeps ``armor_input`` sizes (640/416/320) to document the
accuracy/FLOPs trade of the armor-stage input knob (configs.py,
PERF.md lever 1).

Usage: python tools/eval_synth.py [--scenes 16] [--armor-sizes 640,416,320]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou_xywh(a, b):
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    ix0 = max(ax0, bx0)
    iy0 = max(ay0, by0)
    ix1 = min(ax0 + aw, bx0 + bw)
    iy1 = min(ay0 + ah, by0 + bh)
    iw = max(ix1 - ix0, 0.0)
    ih = max(iy1 - iy0, 0.0)
    inter = iw * ih
    return inter / (aw * ah + bw * bh - inter + 1e-9)


def _collect(detector, scenes):
    """Run the cascade once per scene; return [(dets, scene)] with
    dets = [(conf, rect, armor_detected, label)] for valid slots."""
    import jax

    out = []
    for scene in scenes:
        host = jax.device_get(detector.detect(scene.image))
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
        out.append((dets, scene))
    return out


def _ap_at(per_scene, iou_t: float) -> float:
    """VOC-style average precision at one IoU threshold: detections sorted
    globally by confidence, each greedily matched to the best unused GT of
    its own scene."""
    rows = []  # (conf, scene_idx, det_idx)
    n_gt = 0
    for s, (dets, scene) in enumerate(per_scene):
        n_gt += len(scene.car_xywh)
        rows.extend((conf, s, i) for i, (conf, *_r) in enumerate(dets))
    if n_gt == 0:
        return float("nan")
    rows.sort(key=lambda r: -r[0])
    used = [np.zeros(len(sc.car_xywh), bool) for _, sc in per_scene]
    tp = np.zeros(len(rows))
    for k, (_conf, s, i) in enumerate(rows):
        rect = per_scene[s][0][i][1]
        gts = per_scene[s][1].car_xywh
        best_j, best_v = -1, iou_t
        for j, gt in enumerate(gts):
            if used[s][j]:
                continue
            v = iou_xywh(rect, gt)
            if v >= best_v:
                best_j, best_v = j, v
        if best_j >= 0:
            used[s][best_j] = True
            tp[k] = 1.0
    ctp = np.cumsum(tp)
    recall = ctp / n_gt
    precision = ctp / (np.arange(len(rows)) + 1)
    # All-point interpolation: precision envelope from the right.
    prec_env = np.maximum.accumulate(precision[::-1])[::-1]
    r_prev = 0.0
    ap = 0.0
    for k in range(len(rows)):
        ap += (recall[k] - r_prev) * prec_env[k]
        r_prev = recall[k]
    return float(ap)


def evaluate(detector, scenes, iou_thresh: float = 0.5) -> dict:
    """Greedy conf-ordered matching of detections to GT cars (the legacy
    single-threshold metrics), plus mAP@[.5:.95], per-size recall and
    visibility-aware label accuracy (discriminative on hard scenes)."""
    per_scene = _collect(detector, scenes)
    n_gt = n_det = tp = 0
    n_detected_flag = label_hits = label_total = 0
    vis_hits = vis_total = 0
    size_tp = {"small": 0, "large": 0}
    size_gt = {"small": 0, "large": 0}
    for dets, scene in per_scene:
        order = np.argsort([-d[0] for d in dets]) if dets else []
        used = np.zeros(len(scene.car_xywh), bool)
        n_gt += len(scene.car_xywh)
        for gt in scene.car_xywh:
            size_gt["small" if gt[2] < 250 else "large"] += 1
        for i in order:
            conf, rect, det_flag, label = dets[i]
            n_det += 1
            best_j, best_iou = -1, iou_thresh
            for j, gt in enumerate(scene.car_xywh):
                if used[j]:
                    continue
                v = iou_xywh(rect, gt)
                if v >= best_iou:
                    best_j, best_iou = j, v
            if best_j < 0:
                continue
            used[best_j] = True
            tp += 1
            gt_box = scene.car_xywh[best_j]
            size_tp["small" if gt_box[2] < 250 else "large"] += 1
            # label accuracy on matched cars (armor stage)
            mask = scene.armor_car == best_j
            gt_labels = scene.armor_label[mask]
            if len(gt_labels):
                label_total += 1
                vis = (
                    float(scene.armor_visible[mask][0])
                    if len(scene.armor_visible)
                    else 1.0
                )
                hit = det_flag and int(label) == int(gt_labels[0])
                if det_flag:
                    n_detected_flag += 1
                if hit:
                    label_hits += 1
                if vis >= 0.6:
                    vis_total += 1
                    vis_hits += int(hit)
    thresholds = np.arange(0.5, 0.951, 0.05)
    aps = [_ap_at(per_scene, float(t)) for t in thresholds]
    return {
        "n_gt_cars": n_gt,
        "n_detections": n_det,
        "car_precision": tp / max(n_det, 1),
        "car_recall": tp / max(n_gt, 1),
        "armor_detected_rate": n_detected_flag / max(label_total, 1),
        "label_accuracy": label_hits / max(label_total, 1),
        "label_accuracy_visible": vis_hits / max(vis_total, 1),
        "map_50": round(aps[0], 4),
        "map_50_95": round(float(np.mean(aps)), 4),
        "recall_small": size_tp["small"] / max(size_gt["small"], 1),
        "recall_large": size_tp["large"] / max(size_gt["large"], 1),
        "n_gt_small": size_gt["small"],
    }


def make_eval_scenes(
    n: int,
    seed: int = 1000,
    height=2048,
    width=2592,
    car_size=(180, 660),
    hard: bool = False,
):
    from rm_radar_tpu.train.synth import make_scene

    rng = np.random.default_rng(seed)
    # Camera-resolution scenes; cars sized so the 640-letterbox sees the
    # training distribution (scale 640/2592 = 0.247). ``hard`` adds
    # occlusion / truncation / blur / lighting extremes / distractor cars
    # (train/synth.py::make_scene) — the eval tier with headroom.
    return [
        make_scene(
            rng, height, width, max_cars=6, car_size=car_size, hard=hard
        )
        for _ in range(n)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--seed", type=int, default=1000)
    ap.add_argument("--variant", default="n")
    ap.add_argument("--armor-sizes", default="640,416,320")
    ap.add_argument(
        "--car-input",
        type=int,
        default=640,
        help="car-stage network input (reference 640); non-640 loads the "
        "size-suffixed car checkpoint (car_synth_<variant>_<size>.npz)",
    )
    ap.add_argument("--max-cars", type=int, default=8)
    ap.add_argument("--weights", default="assets/models")
    ap.add_argument(
        "--car-size",
        default="180,660",
        help="car pixel-size range in the 2592x2048 eval scenes; the "
        "reference's typical radar crops are 100-400 px (PERF.md lever 1)",
    )
    ap.add_argument(
        "--hard",
        action="store_true",
        help="hard scene tier: occlusion, edge truncation, motion blur, "
        "lighting extremes, armor-less distractor cars (metrics get "
        "headroom; see PERF.md accuracy section)",
    )
    ap.add_argument(
        "--suffix",
        default="",
        help="checkpoint-name suffix (e.g. '_r4') to evaluate retrain "
        "candidates saved with train_synth --suffix without renaming "
        "the shipped files",
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (this image's sitecustomize pins "
        "JAX_PLATFORMS=axon; the env var alone cannot override it)",
    )
    args = ap.parse_args()

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

    car_suffix = ("" if args.car_input == 640 else f"_{args.car_input}")
    car_suffix += args.suffix
    car_v = load_variables(
        os.path.join(
            args.weights, f"car_synth_{args.variant}{car_suffix}.npz"
        )
    )

    def armor_weights(size: int):
        """Per-size armor checkpoint when available (the deployment design:
        one checkpoint per input shape, like the reference's per-shape
        TensorRT engines), else the 640 baseline checkpoint."""
        sized = os.path.join(
            args.weights,
            f"armor_synth_{args.variant}_{size}{args.suffix}.npz",
        )
        if size != 640 and os.path.exists(sized):
            return load_variables(sized)
        return load_variables(
            os.path.join(
                args.weights, f"armor_synth_{args.variant}{args.suffix}.npz"
            )
        )

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    car_size = tuple(int(v) for v in args.car_size.split(","))
    scenes = make_eval_scenes(
        args.scenes, args.seed, car_size=car_size, hard=args.hard
    )
    results = {}
    for size in (int(s) for s in args.armor_sizes.split(",")):
        armor_v = armor_weights(size)
        det = RobotDetector(
            RobotDetectorConfig(
                max_cars=args.max_cars,
                input_width=args.car_input,
                input_height=args.car_input,
                armor_input_width=size,
                armor_input_height=size,
            ),
            car_variant=args.variant,
            armor_variant=args.variant,
            car_variables=car_v,
            armor_variables=armor_v,
        )
        t0 = time.time()
        metrics = evaluate(det, scenes)
        metrics["wall_s"] = round(time.time() - t0, 1)
        results[f"armor_input_{size}"] = metrics
        print(f"armor_input={size}: {metrics}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
