#!/usr/bin/env python
"""Interleaved A/B of an env-gated knob on the batch-8 tracked program.

The only trustworthy measurement on the tunneled dev chip is an interleaved
same-session A/B (PERF.md "Environment notes"): this harness builds one
Radar per env value (the knob is read at Detector construction), compiles
both batch-8 device-tracked programs, then alternates timed blocks
A,B,A,B,... and reports per-arm medians.

Usage:
    python tools/ab_batch8.py --env RM_RADAR_LETTERBOX_BF16 --values 0,1 \
        [--rounds 4] [--steps 8] [--variant m] [--armor-size 320]
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
    ap.add_argument("--env", default="",
                    help="env-var knob to A/B (read at Radar construction)")
    ap.add_argument("--locator-field", default="",
                    help="LocatorConfig field to A/B instead of an env var "
                    "(int values), e.g. max_foreground")
    ap.add_argument("--detector-field", default="",
                    help="RobotDetectorConfig field to A/B (int values), "
                    "e.g. max_cars")
    ap.add_argument("--armor-size-ab", action="store_true",
                    help="treat --values as armor input sizes; each arm "
                    "loads its own size-matched armor checkpoint")
    ap.add_argument("--car-size-ab", action="store_true",
                    help="treat --values as car-stage input sizes; each "
                    "arm loads its own size-matched car checkpoint")
    ap.add_argument("--values", default="0,1")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--variant", default="m")
    ap.add_argument("--armor-size", type=int, default=320)
    ap.add_argument("--car-size", type=int, default=640,
                    help="fixed car-stage input for both arms (loads the "
                    "size-matched car checkpoint)")
    ap.add_argument("--max-cars", type=int, default=8)
    ap.add_argument("--max-fg", type=int, default=0,
                    help="LocatorConfig.max_foreground override (0 = default)")
    ap.add_argument("--max-points", type=int, default=0,
                    help="LocatorConfig.max_points override (0 = default)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rm_radar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rm_radar_tpu.configs import RadarConfig, RobotDetectorConfig
    from rm_radar_tpu.models.weights import load_variables
    from rm_radar_tpu.pipeline import Radar
    from rm_radar_tpu.train.synth import (
        make_background_cloud,
        make_scene,
        make_scene_cloud,
    )
    from rm_radar_tpu.utils.io import pad_points

    repo = os.path.join(os.path.dirname(__file__), "..")

    def car_weights(size: int):
        suffix = "" if size == 640 else f"_{size}"
        return load_variables(
            os.path.join(
                repo, f"assets/models/car_synth_{args.variant}{suffix}.npz"
            )
        )

    car_v = None if args.car_size_ab else car_weights(args.car_size)

    def armor_weights(size: int):
        suffix = "" if size == 640 else f"_{size}"
        return load_variables(
            os.path.join(
                repo, f"assets/models/armor_synth_{args.variant}{suffix}.npz"
            )
        )

    import dataclasses

    from rm_radar_tpu.configs import LocatorConfig

    def make_config(value: str):
        # Construct per arm AFTER the env is set: env-default config fields
        # (e.g. LocatorConfig.candidate_compaction) are read at construction.
        armor_size = int(value) if args.armor_size_ab else args.armor_size
        car_size = int(value) if args.car_size_ab else args.car_size
        cfg = RadarConfig(
            detector=RobotDetectorConfig(
                max_cars=args.max_cars,
                input_width=car_size,
                input_height=car_size,
                armor_input_width=armor_size,
                armor_input_height=armor_size,
            )
        )
        loc_over = {}
        if args.max_fg:
            loc_over["max_foreground"] = args.max_fg
        if args.max_points:
            loc_over["max_points"] = args.max_points
        if loc_over:
            cfg = dataclasses.replace(
                cfg, locator=dataclasses.replace(cfg.locator, **loc_over)
            )
        if args.locator_field:
            cfg = dataclasses.replace(
                cfg,
                locator=dataclasses.replace(
                    cfg.locator, **{args.locator_field: int(value)}
                ),
            )
        if args.detector_field:
            cfg = dataclasses.replace(
                cfg,
                detector=dataclasses.replace(
                    cfg.detector, **{args.detector_field: int(value)}
                ),
            )
        return cfg

    assert (
        args.env or args.locator_field or args.detector_field
        or args.armor_size_ab or args.car_size_ab
    ), "need an A/B axis (--env/--locator-field/--detector-field/*-size-ab)"
    knob = (
        args.env or args.locator_field or args.detector_field
        or ("car_size" if args.car_size_ab else "armor_size")
    )
    values = args.values.split(",")
    arms = {}
    for v in values:
        if args.env:
            os.environ[args.env] = v
        arms[v] = Radar(
            make_config(v),
            car_variant=args.variant,
            armor_variant=args.variant,
            car_variables=(
                car_weights(int(v)) if args.car_size_ab else car_v
            ),
            armor_variables=armor_weights(
                int(v) if args.armor_size_ab else args.armor_size
            ),
        )
    config = make_config(values[0])

    b = 8
    rng = np.random.default_rng(7)
    scenes = [
        make_scene(rng, 2048, 2592, max_cars=6, car_size=(180, 660))
        for _ in range(b)
    ]
    imgs = jax.device_put(np.stack([s.image for s in scenes]))
    raw_clds = [make_scene_cloud(rng, s) for s in scenes]
    raw_bg = make_background_cloud(rng, 2048, 2592)
    # Stage per arm: cloud capacity (max_points) may be an A/B axis.
    clds_of, bg_of = {}, {}
    for v, radar in arms.items():
        cap = radar.config.locator.max_points
        clds_of[v] = jax.device_put(
            np.stack([pad_points(c, cap) for c in raw_clds])
        )
        bg_of[v] = jax.device_put(
            np.stack([pad_points(raw_bg[:cap], cap)] * b)
        )
    import jax.numpy as jnp

    black = jnp.zeros_like(imgs)
    jax.block_until_ready([imgs, list(clds_of.values()), black])

    steps = {}
    carries = {}
    for v, radar in arms.items():
        t0 = time.time()
        steps[v] = radar.batch_step(tracked=True)
        c = radar.make_batch_tracked_state(b)
        for k in range(config.locator.queue_size):
            c, batch = steps[v](
                c, black, bg_of[v],
                jax.device_put(np.full((b,), 0.1 * (k + 1), np.float32)),
            )
        c, batch = steps[v](
            c, imgs, clds_of[v],
            jax.device_put(np.full((b,), 0.5, np.float32)),
        )
        _ = np.asarray(batch.confidence)
        carries[v] = c
        print(
            f"warm {knob}={v}: {time.time() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )

    results = {v: [] for v in values}
    t_base = 10.0
    for r in range(args.rounds):
        for v in values:
            c = carries[v]
            ts = [
                jax.device_put(np.full((b,), t_base + 0.1 * i, np.float32))
                for i in range(args.steps)
            ]
            jax.block_until_ready(ts)
            t0 = time.perf_counter()
            handles = []
            for i in range(args.steps):
                c, batch = steps[v](c, imgs, clds_of[v], ts[i])
                batch.confidence.copy_to_host_async()
                handles.append(batch.confidence)
            for h in handles:
                _ = np.asarray(h)
            dt = (time.perf_counter() - t0) / args.steps
            results[v].append(dt * 1e3)
            carries[v] = c
        t_base += 0.1 * args.steps

    print(f"\n{knob} A/B, ms per batch-8 step:", file=sys.stderr)
    for v in values:
        arr = np.asarray(results[v])
        print(
            f"  {knob}={v}: med={np.median(arr):7.2f}  "
            + " ".join(f"{x:7.2f}" for x in arr),
            file=sys.stderr,
        )
    meds = {v: float(np.median(results[v])) for v in values}
    base = meds[values[0]]
    for v in values[1:]:
        print(
            f"  delta {v} vs {values[0]}: {meds[v] - base:+.2f} ms/step "
            f"({(meds[v] - base) / 8:+.3f} ms/frame)",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
