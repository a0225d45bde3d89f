#!/usr/bin/env python
"""Detection demo with the framework's own trained weights: runs the fused
car->armor cascade on held-out synthetic RoboMaster-like scenes and saves
annotated PNGs (the visual counterpart of the PERF.md accuracy table).

Usage:
    python tools/demo_synth.py [--scenes 3] [--variant m] [--out docs]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=2000)
    ap.add_argument("--variant", default="m")
    ap.add_argument("--armor-size", type=int, default=320)
    ap.add_argument("--weights", default="assets/models")
    ap.add_argument("--out", default="docs")
    ap.add_argument("--downscale", type=int, default=2,
                    help="output PNG downscale factor (repo friendliness)")
    ap.add_argument("--hard", action="store_true",
                    help="hard scene tier (occlusion/truncation/blur/"
                    "lighting/distractors — see train/synth.py)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pins axon)")
    args = ap.parse_args()

    if args.cpu:
        import os as _os
        _os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/rm_radar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image, ImageDraw

    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector
    from rm_radar_tpu.models.weights import load_variables
    from rm_radar_tpu.train.synth import make_scene
    from rm_radar_tpu.types import Label

    def w(name):
        return load_variables(os.path.join(args.weights, name))

    armor_name = (
        f"armor_synth_{args.variant}.npz"
        if args.armor_size == 640
        else f"armor_synth_{args.variant}_{args.armor_size}.npz"
    )
    det = RobotDetector(
        RobotDetectorConfig(
            max_cars=8,
            armor_input_width=args.armor_size,
            armor_input_height=args.armor_size,
        ),
        car_variant=args.variant,
        armor_variant=args.variant,
        car_variables=w(f"car_synth_{args.variant}.npz"),
        armor_variables=w(armor_name),
    )

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.scenes):
        scene = make_scene(
            rng, 2048, 2592, max_cars=6, car_size=(180, 660), n_cars=6,
            hard=args.hard,
        )
        batch = jax.device_get(det.detect(scene.image))
        rgb = np.ascontiguousarray(scene.image[..., ::-1])
        img = Image.fromarray(rgb)
        draw = ImageDraw.Draw(img)
        # Ground truth in white (thin), detections in team colors (thick).
        for gt in scene.car_xywh:
            x, y, bw, bh = (float(v) for v in gt)
            draw.rectangle([x, y, x + bw, y + bh], outline=(255, 255, 255), width=2)
        hits = 0
        for j in range(len(batch.valid)):
            if not batch.valid[j]:
                continue
            x, y, bw, bh = (float(v) for v in batch.rect[j])
            lab = int(batch.label[j])
            blue = lab <= 4 or lab == 10
            color = (60, 120, 255) if blue else (255, 70, 70)
            draw.rectangle([x, y, x + bw, y + bh], outline=color, width=6)
            name = Label(lab).name if 0 <= lab < 12 else "?"
            conf = float(batch.confidence[j])
            draw.text((x + 4, max(y - 28, 0)), f"{name} {conf:.2f}", fill=color)
            hits += 1
        if args.downscale > 1:
            img = img.resize(
                (img.width // args.downscale, img.height // args.downscale)
            )
        path = os.path.join(args.out, f"demo_synth_{'hard_' if args.hard else ''}{i}.png")
        img.save(path)
        print(
            f"{path}: {hits} robots drawn, {len(scene.car_xywh)} ground truth",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
