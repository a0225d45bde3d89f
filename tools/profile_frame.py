#!/usr/bin/env python
"""Capture a jax.profiler trace of the fused frame program.

Produces a TensorBoard-loadable trace (XLA op timeline) for N steady-state
frames of the stream pipeline — the deep-dive companion to bench.py's
end-to-end p50 and run_stream's operational counters.

Usage:
    python tools/profile_frame.py [--trace-dir /tmp/rm_radar_trace]
        [--frames 6] [--armor-size 320] [--weights synth|random]
Then: tensorboard --logdir <trace-dir>  (or xprof).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/rm_radar_trace")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--variant", default="m")
    ap.add_argument("--armor-size", type=int, default=320)
    ap.add_argument("--max-cars", type=int, default=8)
    ap.add_argument("--weights", default="synth", choices=["synth", "random"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rm_radar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rm_radar_tpu.configs import RadarConfig, RobotDetectorConfig
    from rm_radar_tpu.pipeline import Radar
    from rm_radar_tpu.train.synth import make_scene
    from rm_radar_tpu.types import Frame
    from rm_radar_tpu.utils.io import pad_points
    from rm_radar_tpu.utils.timer import maybe_profile

    repo = os.path.join(os.path.dirname(__file__), "..")
    car_v = armor_v = None
    if args.weights == "synth":
        from rm_radar_tpu.models.weights import load_variables

        suffix = "" if args.armor_size == 640 else f"_{args.armor_size}"
        car_v = load_variables(
            os.path.join(repo, f"assets/models/car_synth_{args.variant}.npz")
        )
        armor_v = load_variables(
            os.path.join(
                repo, f"assets/models/armor_synth_{args.variant}{suffix}.npz"
            )
        )

    from rm_radar_tpu.configs import LocatorConfig

    radar = Radar(
        RadarConfig(
            detector=RobotDetectorConfig(
                max_cars=args.max_cars,
                armor_input_width=args.armor_size,
                armor_input_height=args.armor_size,
            ),
            # The bench's shipped capacities (PERF.md round-3 A/Bs).
            locator=LocatorConfig(max_foreground=1024, max_points=10240),
        ),
        car_variant=args.variant,
        armor_variant=args.variant,
        car_variables=car_v,
        armor_variables=armor_v,
    )

    rng = np.random.default_rng(11)
    scenes = [make_scene(rng, 2048, 2592, max_cars=6) for _ in range(4)]
    cloud = rng.uniform(1000, 25000, size=(10000, 3)).astype(np.float32)
    dev_imgs = [jax.device_put(s.image) for s in scenes]
    dev_cloud = jax.device_put(
        pad_points(cloud, radar.config.locator.max_points)
    )
    radar.update_background_cloud(cloud, max_cars=args.max_cars)

    def gen(n, t0=0.0):
        for i in range(n):
            yield Frame(
                image=dev_imgs[i % len(dev_imgs)],
                point_cloud=dev_cloud,
                timestamp=t0 + 0.1 * i,
            )

    # Warm (compile) outside the trace so the trace holds steady-state only.
    t0 = time.time()
    for _ in radar.run_stream(gen(4)):
        pass
    print(f"warm in {time.time() - t0:.1f}s; tracing...", file=sys.stderr)

    with maybe_profile(args.trace_dir):
        for _ in radar.run_stream(gen(args.frames, t0=10.0)):
            pass
    print(f"trace written to {args.trace_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
