#!/usr/bin/env python
"""GT-matched A/B of the LiDAR-gated tiled car stage (bench workload).

The bench's occupancy telemetry showed the gate's detected-count 19 vs the
full grid's 21 on the final step — counts alone cannot say whether the
gate dropped real cars (recall loss) or pruned empty-floor false
positives (precision gain). This tool decides it: the bench's own tiled
scenes carry exact ground truth (train/synth.py::make_scene), so it runs
the SAME batch-8 device-tracked program (same seeds, priming and bucket
as BENCH_TILED=1) once per mode and scores detections against GT at
IoU 0.5, per camera.

Usage (TPU):  python tools/ab_tile_gate.py [--topk 12] [--iou 0.5]
Prints per-mode TP / FN / FP and the per-camera disagreements.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def iou(a, b):
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    ix = max(0.0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0))
    iy = max(0.0, min(ay0 + ah, by0 + bh) - max(ay0, by0))
    inter = ix * iy
    return inter / max(aw * ah + bw * bh - inter, 1e-9)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topk", type=int, default=12)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--max-cars", type=int, default=12)
    ap.add_argument("--car-size", type=int, default=512)
    ap.add_argument("--armor-size", type=int, default=256)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from rm_radar_tpu.configs import (
        LocatorConfig,
        RadarConfig,
        RobotDetectorConfig,
    )
    from rm_radar_tpu.models.weights import load_variables
    from rm_radar_tpu.pipeline import Radar
    from rm_radar_tpu.train.synth import (
        make_background_cloud,
        make_scene,
        make_scene_cloud,
    )
    from rm_radar_tpu.utils.io import pad_points

    # EXACTLY the BENCH_TILED=1 workload (bench.py main): seed 7, 10 scenes,
    # small-car regime, scene-correlated clouds, background prime.
    rng = np.random.default_rng(7)
    scenes = [
        make_scene(rng, 2048, 2592, max_cars=6, car_size=(40, 170))
        for _ in range(10)
    ]
    clouds = [make_scene_cloud(rng, s) for s in scenes]
    background = make_background_cloud(rng, 2048, 2592)
    car_w = os.path.join(
        REPO, "assets/models", f"car_synth_m_{args.car_size}.npz"
    )
    armor_w = os.path.join(
        REPO, "assets/models", f"armor_synth_m_{args.armor_size}.npz"
    )
    car_v = load_variables(car_w)
    armor_v = load_variables(armor_w)

    b = 8
    imgs = jax.device_put(np.stack([scenes[i].image for i in range(b)]))
    max_points = 10240
    clds = jax.device_put(
        np.stack([pad_points(clouds[i], max_points) for i in range(b)])
    )

    results = {}
    for topk in (0, args.topk):
        config = RadarConfig(
            detector=RobotDetectorConfig(
                max_cars=args.max_cars,
                input_width=args.car_size,
                input_height=args.car_size,
                armor_input_width=args.armor_size,
                armor_input_height=args.armor_size,
                crop_window=768,
                car_tile=args.car_size,
                car_tile_topk=topk,
            ),
            locator=LocatorConfig(max_foreground=1024, max_points=max_points),
        )
        radar = Radar(
            config,
            car_variant="m",
            armor_variant="m",
            car_variables=car_v,
            armor_variables=armor_v,
        )
        carries = radar.make_batch_tracked_state(b)
        step = radar.batch_step(tracked=True, max_cars=args.max_cars)
        cap = max_points
        chunks = [
            background[i : i + cap] for i in range(0, len(background), cap)
        ]
        black = jnp.zeros_like(imgs)
        k = 0
        for _ in range(radar.config.locator.queue_size):
            for chunk in chunks:
                bg_clds = jax.device_put(np.stack([pad_points(chunk, cap)] * b))
                carries, batch = step(
                    carries,
                    black,
                    bg_clds,
                    jax.device_put(np.full((b,), 0.1 + 0.02 * k, np.float32)),
                )
                k += 1
        carries, batch = step(
            carries, imgs, clds, jax.device_put(np.full((b,), 1.0, np.float32))
        )
        full = jax.device_get(batch)
        per_cam = []
        tp = fn = fp = 0
        for i in range(b):
            det = [
                np.asarray(full.rect[i][j], np.float64)
                for j in range(full.rect.shape[1])
                if full.valid[i][j] and full.detected[i][j]
            ]
            gts = scenes[i].car_xywh
            matched = [
                any(iou(d, g) >= args.iou for d in det) for g in gts
            ]
            false_pos = [
                d for d in det if not any(iou(d, g) >= args.iou for g in gts)
            ]
            tp += sum(matched)
            fn += len(gts) - sum(matched)
            fp += len(false_pos)
            per_cam.append(
                dict(
                    n_gt=len(gts),
                    n_det=len(det),
                    miss=[list(map(float, g)) for g, m in zip(gts, matched) if not m],
                    fp=[list(map(float, d)) for d in false_pos],
                )
            )
        results[topk] = dict(tp=tp, fn=fn, fp=fp, per_cam=per_cam)
        print(
            f"mode topk={topk}: TP={tp} FN={fn} FP={fp} "
            f"(GT cars={tp + fn})",
            flush=True,
        )

    a, g = results[0], results[args.topk]
    print("\nper-camera disagreements (full-grid vs gated):")
    for i, (ca, cg) in enumerate(zip(a["per_cam"], g["per_cam"])):
        if ca != cg:
            print(f"  cam {i}: full={ca}\n         gated={cg}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
