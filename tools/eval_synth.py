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


def evaluate(detector, scenes, iou_thresh: float = 0.5) -> dict:
    """Greedy conf-ordered matching of detections to GT cars."""
    n_gt = n_det = tp = 0
    n_detected_flag = label_hits = label_total = 0
    for scene in scenes:
        batch = detector.detect(scene.image)
        import jax

        host = jax.device_get(batch)
        order = np.argsort(-host.confidence)
        used = np.zeros(len(scene.car_xywh), bool)
        n_gt += len(scene.car_xywh)
        for i in order:
            if not host.valid[i]:
                continue
            n_det += 1
            best_j, best_iou = -1, iou_thresh
            for j, gt in enumerate(scene.car_xywh):
                if used[j]:
                    continue
                v = iou_xywh(host.rect[i], gt)
                if v >= best_iou:
                    best_j, best_iou = j, v
            if best_j < 0:
                continue
            used[best_j] = True
            tp += 1
            # label accuracy on matched cars (armor stage)
            gt_labels = scene.armor_label[scene.armor_car == best_j]
            if len(gt_labels):
                label_total += 1
                if host.detected[i]:
                    n_detected_flag += 1
                    if int(host.label[i]) == int(gt_labels[0]):
                        label_hits += 1
    return {
        "n_gt_cars": n_gt,
        "n_detections": n_det,
        "car_precision": tp / max(n_det, 1),
        "car_recall": tp / max(n_gt, 1),
        "armor_detected_rate": n_detected_flag / max(label_total, 1),
        "label_accuracy": label_hits / max(label_total, 1),
    }


def make_eval_scenes(
    n: int,
    seed: int = 1000,
    height=2048,
    width=2592,
    car_size=(180, 660),
):
    from rm_radar_tpu.train.synth import make_scene

    rng = np.random.default_rng(seed)
    # Camera-resolution scenes; cars sized so the 640-letterbox sees the
    # training distribution (scale 640/2592 = 0.247).
    return [
        make_scene(rng, height, width, max_cars=6, car_size=car_size)
        for _ in range(n)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--seed", type=int, default=1000)
    ap.add_argument("--variant", default="n")
    ap.add_argument("--armor-sizes", default="640,416,320")
    ap.add_argument("--max-cars", type=int, default=8)
    ap.add_argument("--weights", default="assets/models")
    ap.add_argument(
        "--car-size",
        default="180,660",
        help="car pixel-size range in the 2592x2048 eval scenes; the "
        "reference's typical radar crops are 100-400 px (PERF.md lever 1)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector
    from rm_radar_tpu.models.weights import load_variables

    car_v = load_variables(
        os.path.join(args.weights, f"car_synth_{args.variant}.npz")
    )

    def armor_weights(size: int):
        """Per-size armor checkpoint when available (the deployment design:
        one checkpoint per input shape, like the reference's per-shape
        TensorRT engines), else the 640 baseline checkpoint."""
        sized = os.path.join(
            args.weights, f"armor_synth_{args.variant}_{size}.npz"
        )
        if size != 640 and os.path.exists(sized):
            return load_variables(sized)
        return load_variables(
            os.path.join(args.weights, f"armor_synth_{args.variant}.npz")
        )

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    car_size = tuple(int(v) for v in args.car_size.split(","))
    scenes = make_eval_scenes(args.scenes, args.seed, car_size=car_size)
    results = {}
    for size in (int(s) for s in args.armor_sizes.split(",")):
        armor_v = armor_weights(size)
        det = RobotDetector(
            RobotDetectorConfig(
                max_cars=args.max_cars,
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
