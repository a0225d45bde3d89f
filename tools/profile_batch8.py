#!/usr/bin/env python
"""Per-stage accounting of the batch-8 device-tracked program.

Standalone per-op microbenchmarks are meaningless on the tunneled dev chip
(~2-3 ms dispatch overhead, ±30% session drift — see PERF.md), so this tool
measures stages by *ablation inside the real program*: every variant is the
same fused batch-8 frame code, but returns only the outputs of a prefix of
the pipeline — XLA dead-code-eliminates the rest. All variants are timed
interleaved in one session (R rounds x T steps each); adjacent deltas give
per-stage device time:

    full      detect + locate + device-track        (the bench program)
    notrack   detect + locate (update/cluster/search)
    nosearch  detect + update + cluster
    ccfree    nosearch with cc_iterations=0 (CC propagation rounds ablated)
    nocluster detect + update
    nolocate  detect only (cascade + postprocess + dedup)
    nopost    car detect + crops + armor model raw (armor postprocess ablated)
    car       car stage only (letterbox + model + postprocess)
    carraw    car letterbox + model raw (car postprocess ablated)

Workload mirrors bench.py batch8 synth mode exactly: trained yolov8m,
armor@320, 8 cameras, scene-correlated clouds, background primed.

Usage:
    python tools/profile_batch8.py [--rounds 4] [--steps 10]
        [--variants full,notrack,...] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _checksum_tree(tree) -> "object":
    import jax
    import jax.numpy as jnp

    total = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(tree):
        x = jnp.where(jnp.isnan(leaf), 0, leaf) if jnp.issubdtype(
            leaf.dtype, jnp.floating
        ) else leaf
        total = total + jnp.sum(x).astype(jnp.float32)
    return total


def build_variants(radar, names):
    """Map name -> (fn, has_state, needs_ts). fn signatures:
    state-carrying: (state, imgs, clds[, ts]) -> (state, scalar)
    stateless:      (imgs,) -> scalar
    """
    import dataclasses
    import jax
    import jax.numpy as jnp  # noqa: F811

    from rm_radar_tpu.locate import locator as locate_mod
    from rm_radar_tpu.track import device_tracker as dtrack

    det = radar.detector
    loc = radar.locator
    lc = radar.config.locator
    out = {}

    def detect_one(image):
        return det.detect_fn(image, crop_window=0)

    def full(carry, image, points, ts):
        (ls, store) = carry
        robots, ls, _ = radar._frame_fn(ls, image, points, crop_window=0)
        store, robots = dtrack.update(store, robots, ts, radar.config.tracker)
        return (ls, store), _checksum_tree(robots)

    def notrack(ls, image, points):
        robots, ls, _ = radar._frame_fn(ls, image, points, crop_window=0)
        return ls, _checksum_tree(robots)

    def nosearch(ls, image, points):
        robots = detect_one(image)
        ls, diff = locate_mod.update(ls, points, loc.calib, lc)
        fg = locate_mod.cluster(
            diff, loc.calib, lc, candidates=ls
        )
        return ls, _checksum_tree(robots) + _checksum_tree(
            (fg.points, fg.cluster)
        )

    lc0 = dataclasses.replace(lc, cc_iterations=0)

    def ccfree(ls, image, points):
        robots = detect_one(image)
        ls, diff = locate_mod.update(ls, points, loc.calib, lc0)
        fg = locate_mod.cluster(
            diff, loc.calib, lc0, candidates=ls
        )
        return ls, _checksum_tree(robots) + _checksum_tree(
            (fg.points, fg.cluster)
        )

    def nocluster(ls, image, points):
        robots = detect_one(image)
        ls, diff = locate_mod.update(ls, points, loc.calib, lc)
        return ls, _checksum_tree(robots) + jnp.sum(diff)

    def nolocate(image):
        return _checksum_tree(detect_one(image))

    def nopost(image):
        # Car stage + fused crops + armor model raw; armor postprocess,
        # classification and dedup are dead.
        import functools

        from rm_radar_tpu.ops.preprocess import (
            letterbox_crop,
            letterbox_crop_s2d,
        )
        from rm_radar_tpu.detect.detector import _crop_batch

        cfg = radar.config.detector
        cars = det.car.detect_fn(image, max_detections=cfg.max_cars)
        use_s2d = getattr(det.armor.model.cfg, "s2d_stem", False)
        crop_kind = letterbox_crop_s2d if use_s2d else letterbox_crop
        mm_dtype = (
            det.armor.model.dtype
            if det.armor.model.dtype == jnp.bfloat16
            else None
        )
        crop_fn = functools.partial(
            crop_kind,
            dst_height=cfg.armor_input_height,
            dst_width=cfg.armor_input_width,
            matmul_dtype=mm_dtype,
        )
        blobs, pparams = _crop_batch(image, cars, crop_fn, 0)
        if use_s2d:
            raw = det.armor.model.apply(
                det.armor.variables, blobs, pre_s2d=True
            )
        else:
            raw = det.armor.raw_forward(blobs)
        return _checksum_tree(cars) + jnp.sum(raw.astype(jnp.float32))

    def car(image):
        return _checksum_tree(
            det.car.detect_fn(image, max_detections=radar.config.detector.max_cars)
        )

    def _car_blob(image):
        # Mirror Detector.detect_fn's preprocessing exactly, including the
        # env-gated letterbox knobs (mm dtype, banded lowering) — the stage
        # numbers must measure the same lowering the shipped program runs.
        from rm_radar_tpu.ops.preprocess import letterbox, letterbox_s2d

        c = det.car
        if c.use_letterbox_s2d and getattr(c.model.cfg, "s2d_stem", False):
            blob, _ = letterbox_s2d(
                image,
                c.config.input_height,
                c.config.input_width,
                matmul_dtype=c.letterbox_mm_dtype,
                band_block=c.letterbox_band,
            )
            return blob, True
        blob, _ = letterbox(image, c.config.input_height, c.config.input_width)
        return blob, False

    def carraw(image):
        c = det.car
        blob, s2d = _car_blob(image)
        if s2d:
            raw = c.model.apply(c.variables, blob[None], pre_s2d=True)
        else:
            raw = c.model.apply(c.variables, blob[None])
        return jnp.sum(raw.astype(jnp.float32))

    def carlb(image):
        # Car letterbox alone (the resample matmuls + pad), no model:
        # isolates the s2d letterbox residue the banded lowering targets.
        blob, _ = _car_blob(image)
        return jnp.sum(blob.astype(jnp.float32))

    defs = {
        "full": (full, "tracked", True),
        "notrack": (notrack, "loc", False),
        "nosearch": (nosearch, "loc", False),
        "ccfree": (ccfree, "loc", False),
        "nocluster": (nocluster, "loc", False),
        "nolocate": (nolocate, None, False),
        "nopost": (nopost, None, False),
        "car": (car, None, False),
        "carraw": (carraw, None, False),
        "carlb": (carlb, None, False),
    }
    for name in names:
        fn, state_kind, needs_ts = defs[name]
        if state_kind is None:
            vm = jax.vmap(fn)
            out[name] = (jax.jit(lambda im, _f=vm: jnp.sum(_f(im))), None, False)
        elif state_kind == "tracked":
            vm = jax.vmap(fn)
            out[name] = (
                jax.jit(
                    lambda c, im, p, t, _f=vm: (
                        lambda r: (r[0], jnp.sum(r[1]))
                    )(_f(c, im, p, t)),
                    donate_argnums=(0,),
                ),
                "tracked",
                True,
            )
        else:
            vm = jax.vmap(fn)
            out[name] = (
                jax.jit(
                    lambda s, im, p, _f=vm: (
                        lambda r: (r[0], jnp.sum(r[1]))
                    )(_f(s, im, p)),
                    donate_argnums=(0,),
                ),
                "loc",
                False,
            )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--variant", default="m")
    ap.add_argument("--armor-size", type=int, default=320)
    ap.add_argument("--car-size", type=int, default=640,
                    help="car-stage input (loads size-matched checkpoint)")
    ap.add_argument("--max-fg", type=int, default=0,
                    help="LocatorConfig.max_foreground override (0=default)")
    ap.add_argument("--max-points", type=int, default=0,
                    help="LocatorConfig.max_points override (0=default)")
    ap.add_argument("--max-cars", type=int, default=8)
    ap.add_argument(
        "--variants",
        default="full,notrack,nosearch,ccfree,nocluster,nolocate,nopost,car,carraw,carlb",
    )
    ap.add_argument("--trace-dir", default="")
    ap.add_argument(
        "--smoke",
        action="store_true",
        help="CPU smoke test: tiny models/images/random weights, 1 round",
    )
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

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
    from rm_radar_tpu.utils.timer import maybe_profile

    repo = os.path.join(os.path.dirname(__file__), "..")
    suffix = "" if args.armor_size == 640 else f"_{args.armor_size}"
    if args.smoke:
        from rm_radar_tpu.configs import LocatorConfig

        args.rounds, args.steps = 1, 2
        h, w = 256, 320
        config = RadarConfig(
            detector=RobotDetectorConfig(
                max_cars=4,
                input_width=128,
                input_height=128,
                armor_input_width=64,
                armor_input_height=64,
            ),
            locator=LocatorConfig(
                image_width=w,
                image_height=h,
                max_points=512,
                max_foreground=128,
            ),
        )
        radar = Radar(config, car_variant="n", armor_variant="n")
    else:
        import dataclasses

        config = RadarConfig(
            detector=RobotDetectorConfig(
                max_cars=args.max_cars,
                input_width=args.car_size,
                input_height=args.car_size,
                armor_input_width=args.armor_size,
                armor_input_height=args.armor_size,
            )
        )
        loc_over = {}
        if args.max_fg:
            loc_over["max_foreground"] = args.max_fg
        if args.max_points:
            loc_over["max_points"] = args.max_points
        if loc_over:
            config = dataclasses.replace(
                config,
                locator=dataclasses.replace(config.locator, **loc_over),
            )
        car_suffix = "" if args.car_size == 640 else f"_{args.car_size}"
        radar = Radar(
            config,
            car_variant=args.variant,
            armor_variant=args.variant,
            car_variables=load_variables(
                os.path.join(
                    repo,
                    f"assets/models/car_synth_{args.variant}{car_suffix}.npz",
                )
            ),
            armor_variables=load_variables(
                os.path.join(
                    repo,
                    f"assets/models/armor_synth_{args.variant}{suffix}.npz",
                )
            ),
        )

    b = 2 if args.smoke else 8
    img_h = config.locator.image_height
    img_w = config.locator.image_width
    rng = np.random.default_rng(7)
    scenes = [
        make_scene(
            rng,
            img_h,
            img_w,
            max_cars=6,
            car_size=(180, 660) if not args.smoke else (30, 80),
        )
        for _ in range(b)
    ]
    cap = radar.config.locator.max_points
    imgs = jax.device_put(np.stack([s.image for s in scenes]))
    clds = jax.device_put(
        np.stack([pad_points(make_scene_cloud(rng, s), cap) for s in scenes])
    )
    bg_clds = jax.device_put(
        np.stack(
            [
                pad_points(
                    make_background_cloud(rng, img_h, img_w, max_points=cap),
                    cap,
                )
            ]
            * b
        )
    )
    black = jax.device_put(np.zeros_like(np.asarray(imgs)))
    jax.block_until_ready([imgs, clds, bg_clds, black])

    names = [v for v in args.variants.split(",") if v]
    variants = build_variants(radar, names)

    # Prime + warm (compile) each variant.
    import jax.numpy as jnp

    state_of = {}
    for name, (fn, kind, needs_ts) in variants.items():
        t0 = time.time()
        if kind == "tracked":
            st = radar.make_batch_tracked_state(b)
        elif kind == "loc":
            st = radar.make_batch_state(b)
        else:
            st = None
        if kind is not None:
            for k in range(radar.config.locator.queue_size):
                ts = jax.device_put(np.full((b,), 0.1 * (k + 1), np.float32))
                stargs = (st, black, bg_clds) + ((ts,) if needs_ts else ())
                st, _ = fn(*stargs)
            ts = jax.device_put(np.full((b,), 0.5, np.float32))
            st, chk = fn(*((st, imgs, clds) + ((ts,) if needs_ts else ())))
            _ = float(chk)
            state_of[name] = st
        else:
            chk = fn(imgs)
            _ = float(chk)
        print(
            f"warm {name}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True
        )

    if args.trace_dir:
        # Trace the full variant only (steady state).
        fn, kind, _ = variants["full"]
        st = state_of["full"]
        with maybe_profile(args.trace_dir):
            for i in range(args.steps):
                ts = jax.device_put(np.full((b,), 1.0 + 0.1 * i, np.float32))
                st, chk = fn(st, imgs, clds, ts)
            _ = float(chk)
        state_of["full"] = st
        print(f"trace written to {args.trace_dir}", file=sys.stderr)

    # Interleaved timing rounds.
    results = {n: [] for n in names}
    t_base = 10.0
    for r in range(args.rounds):
        for name in names:
            fn, kind, needs_ts = variants[name]
            st = state_of.get(name)
            ts_steps = [
                jax.device_put(
                    np.full((b,), t_base + 0.1 * i, np.float32)
                )
                for i in range(args.steps)
            ]
            jax.block_until_ready(ts_steps)
            t0 = time.perf_counter()
            chks = []
            for i in range(args.steps):
                if kind == "tracked":
                    st, chk = fn(st, imgs, clds, ts_steps[i])
                elif kind == "loc":
                    st, chk = fn(st, imgs, clds)
                else:
                    chk = fn(imgs)
                chk.copy_to_host_async()
                chks.append(chk)
            for c in chks:
                _ = float(c)
            dt = (time.perf_counter() - t0) / args.steps
            results[name].append(dt * 1e3)
            if kind is not None:
                state_of[name] = st
        t_base += 0.1 * args.steps

    print("\nper-variant ms/step (batch of 8 frames); rounds:", file=sys.stderr)
    meds = {}
    for name in names:
        arr = np.asarray(results[name])
        meds[name] = float(np.median(arr))
        print(
            f"  {name:10s} med={np.median(arr):7.2f}  "
            + " ".join(f"{v:7.2f}" for v in arr),
            file=sys.stderr,
        )

    def delta(a, b_):
        if a in meds and b_ in meds:
            print(
                f"  {a:>9s} - {b_:9s} = {meds[a] - meds[b_]:7.2f} ms/step "
                f"({(meds[a] - meds[b_]) / b:.3f} ms/frame)",
                file=sys.stderr,
            )

    print("\nstage deltas:", file=sys.stderr)
    delta("full", "notrack")
    delta("notrack", "nosearch")
    delta("nosearch", "ccfree")
    delta("nosearch", "nocluster")
    delta("nocluster", "nolocate")
    delta("nolocate", "nopost")
    delta("nolocate", "car")
    delta("car", "carraw")
    delta("carraw", "carlb")
    print(
        f"\nfull: {meds.get('full', float('nan')):.2f} ms/step = "
        f"{meds.get('full', float('nan')) / b:.3f} ms/frame",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
