#!/usr/bin/env python
"""Demo: run the full radar pipeline over the bundled 10-frame asset
sequence and save annotated images.

Equivalent of the reference sample app (samples/main.cpp:74-99): same
calibration, 100 ms frame spacing, background priming, then runOnce per
frame — with PNG output instead of imshow windows.

Usage:
    python tools/demo.py [--assets /root/reference/assets] [--out /tmp/demo]
    [--car-weights car.npz --armor-weights armor.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--assets", default="/root/reference/assets")
    parser.add_argument("--out", default="/tmp/rm_radar_demo")
    parser.add_argument("--car-weights")
    parser.add_argument("--armor-weights")
    parser.add_argument("--variant", default="m")
    parser.add_argument("--max-cars", type=int, default=8)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rm_radar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rm_radar_tpu.configs import RadarConfig, RobotDetectorConfig
    from rm_radar_tpu.models.weights import load_variables
    from rm_radar_tpu.pipeline import Radar
    from rm_radar_tpu.types import Frame
    from rm_radar_tpu.utils.io import load_asset_sequence
    from rm_radar_tpu.utils.visualize import draw_robots

    images, clouds, background = load_asset_sequence(args.assets)
    radar = Radar(
        RadarConfig(detector=RobotDetectorConfig(max_cars=args.max_cars)),
        car_variant=args.variant,
        armor_variant=args.variant,
        car_variables=(
            load_variables(args.car_weights) if args.car_weights else None
        ),
        armor_variables=(
            load_variables(args.armor_weights) if args.armor_weights else None
        ),
    )
    radar.update_background_cloud(
        background if background is not None else clouds[0]
    )

    os.makedirs(args.out, exist_ok=True)
    for i, (image, cloud) in enumerate(zip(images, clouds)):
        t0 = time.perf_counter()
        robots = radar.run_once(
            Frame(image=image, point_cloud=cloud, timestamp=0.1 * i)
        )
        dt = (time.perf_counter() - t0) * 1e3
        path = os.path.join(args.out, f"frame_{i}.png")
        draw_robots(image, robots, save_path=path)
        print(f"frame {i}: {dt:.1f} ms, {len(robots)} robots -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
