#!/usr/bin/env python
"""Interleaved A/B of env knobs on the SINGLE-CAMERA cascade, device-timed.

The batch-8 harness (tools/ab_batch8.py) vmaps the cascade, which turns the
windowed-crop lax.cond into a select — so knobs that live on the windowed
single-camera path (RM_RADAR_CROP_PALLAS, crop_window variants) never
engage there. This harness instead runs the cascade over frames with
``lax.scan`` (sequential, conds stay real branches) inside ONE dispatched
program per timed block, so the ~2-3 ms per-dispatch relay overhead of this
environment amortizes over the scanned frames and sub-ms deltas are
measurable. Arms alternate A,B,A,B,... in one session (the only
trustworthy comparison on this chip — PERF.md "Environment notes").

Usage:
    python tools/ab_scan_single.py --env RM_RADAR_CROP_PALLAS --values 0,1 \
        [--rounds 4] [--frames 8] [--reps 4] [--variant m] \
        [--car-size 512] [--armor-size 256]
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
    ap.add_argument("--env", required=True)
    ap.add_argument("--values", default="0,1")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4,
                    help="scan repetitions of the frame set per dispatch")
    ap.add_argument("--variant", default="m")
    ap.add_argument("--car-size", type=int, default=512)
    ap.add_argument("--armor-size", type=int, default=256)
    ap.add_argument("--max-cars", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rm_radar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector
    from rm_radar_tpu.models.weights import load_variables
    from rm_radar_tpu.train.synth import make_scene

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    car_sfx = "" if args.car_size == 640 else f"_{args.car_size}"
    armor_sfx = "" if args.armor_size == 640 else f"_{args.armor_size}"
    car_v = load_variables(
        f"{repo}/assets/models/car_synth_{args.variant}{car_sfx}.npz"
    )
    armor_v = load_variables(
        f"{repo}/assets/models/armor_synth_{args.variant}{armor_sfx}.npz"
    )

    rng = np.random.default_rng(7)
    scenes = [
        make_scene(rng, 2048, 2592, max_cars=6, car_size=(180, 660))
        for _ in range(args.frames)
    ]
    imgs = jax.device_put(np.stack([s.image for s in scenes]))
    jax.block_until_ready(imgs)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    values = args.values.split(",")
    arms = {}
    prev = os.environ.get(args.env)
    for v in values:
        os.environ[args.env] = v
        det = RobotDetector(
            RobotDetectorConfig(
                max_cars=args.max_cars,
                input_width=args.car_size,
                input_height=args.car_size,
                armor_input_width=args.armor_size,
                armor_input_height=args.armor_size,
            ),
            car_variant=args.variant,
            armor_variant=args.variant,
            car_variables=car_v,
            armor_variables=armor_v,
        )

        def block(images, det=det):
            def body(acc, im):
                r = det.detect_fn(im)
                s = (
                    jnp.sum(r.rect)
                    + jnp.sum(r.confidence)
                    + jnp.sum(r.n_cars.astype(jnp.float32))
                )
                return acc + s, ()

            def rep(acc, _):
                acc, _u = jax.lax.scan(body, acc, images)
                return acc, ()

            acc, _ = jax.lax.scan(
                rep, jnp.float32(0.0), None, length=args.reps
            )
            return acc

        arms[v] = jax.jit(block)
    if prev is None:
        os.environ.pop(args.env, None)
    else:
        os.environ[args.env] = prev

    # Compile + warm both arms.
    for v, fn in arms.items():
        t0 = time.time()
        _ = float(fn(imgs))
        print(f"arm {v}: compile+first {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)

    per_arm = {v: [] for v in values}
    n_casc = args.frames * args.reps
    for r in range(args.rounds):
        for v in values:
            t0 = time.perf_counter()
            val = float(arms[v](imgs))  # scalar fetch forces execution
            dt = (time.perf_counter() - t0) / n_casc * 1e3
            per_arm[v].append(dt)
            print(
                f"round {r} arm {v}: {dt:.3f} ms/cascade (chk {val:.1f})",
                file=sys.stderr,
                flush=True,
            )
    print("--- medians (ms per single-camera cascade) ---")
    meds = {v: float(np.median(per_arm[v])) for v in values}
    for v in values:
        print(f"{args.env}={v}: {meds[v]:.3f}  (all: "
              f"{[round(x, 3) for x in per_arm[v]]})")
    base = meds[values[0]]
    for v in values[1:]:
        print(f"delta {v} vs {values[0]}: {meds[v] - base:+.3f} ms/cascade")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
