#!/usr/bin/env python
"""End-to-end benchmark: detect + locate + track ms/frame on the bundled
asset workload (2592x2048 frames, ~10k-point clouds — the exact shape behind
the reference's 11 ms on RTX 3060 Ti, reference README.md:38).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": <p50 ms>, "unit": "ms", "vs_baseline": <11/value>}
Diagnostics go to stderr.

Flags (env):
  BENCH_FRAMES   total timed frames (default 80)
  BENCH_MAX_CARS armor-batch capacity / bucket (default 8; reference's
                 kMaxBatchSize is 20 but its dynamic batch tracked the real
                 car count, typically <= 6-8 — see SURVEY.md §2.7)
  BENCH_VARIANT  yolov8 variant for both stages (default "m", the variant
                 behind the reference's headline numbers)
  BENCH_MODE     "batch8" (default): 8-camera device-tracked batched step,
                 reports frames/sec/chip — the reproducible headline on the
                 tunneled dev chip (round-to-round spread 0.3%, immune to
                 the relay's ±30% session drift; three round-2 samples and
                 the round-3 confirm agree). "stream": pipelined
                 single-camera ms/frame p50 — closer to the reference's
                 per-frame latency measure, but on this tunnel it times the
                 relay as much as the chip; same-session A/B numbers are in
                 PERF.md.
  BENCH_ARMOR_SIZE  armor-stage network input (default 256). The reference
                 runs its armor engine at 640, but radar car crops are
                 100-400 px, so 640 mostly upsamples; 256 cuts armor FLOPs
                 6.25x with zero measured accuracy cost once trained for
                 (held-out sweeps at the bench's own yolov8m: easy-tier
                 P/R/label 1.0 and mAP equal to 320; the 24-scene hard
                 tier reads >= 320 on every metric; the batch-8
                 interleaved A/B measured -0.95 ms/frame vs 320 —
                 tools/eval_synth.py, PERF.md). Set 640 for the strict
                 reference configuration; 320/416/640 numbers are
                 recorded in PERF.md.
  BENCH_TILED    "1": run the car stage TILED at native resolution
                 (RobotDetectorConfig.car_tile = BENCH_CAR_SIZE, overlap
                 192) — the configuration that actually detects the
                 reference's own 2592x2048 match frames, whose median robot
                 is 62 px (letterboxed to 512 that is ~12 px, below any
                 trained scale; PERF.md real-frame section). The synthetic
                 scenes switch to the matching small-robot regime (car
                 extents 40-170 px native, the scale the tile-level
                 training renders), so car counts, crop sizes and armor
                 occupancy follow the real tiled workload. The car stage
                 then runs a 48-tile batch per frame instead of one 512
                 letterbox — this mode measures what small-object coverage
                 of the full frame costs, vs the letterboxed headline.
  BENCH_TILE_TOPK  (tiled mode only) K > 0: LiDAR-gated tile selection —
                 score every tile by the locator's depth-diff foreground
                 and run the car model on only the K best tiles per camera
                 (RobotDetectorConfig.car_tile_topk; detect/tile_select.py
                 for the contract). Post-run telemetry reports foreground
                 blocks the gate left uncovered and alarms if nonzero.
  BENCH_WEIGHTS  "synth" (default when assets/models has checkpoints for
                 BENCH_VARIANT): real trained weights + synthetic 2592x2048
                 scenes with realistic car counts, so detection counts, crop
                 sizes and bucket escalation follow the actual workload —
                 the reference's 11 ms was likewise measured with real
                 weights on real match frames. "random": random-init weights
                 on the asset frames; car NMS then saturates capacity every
                 frame, making this the shape-dominated worst case.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MS = 11.0  # reference full pipeline on RTX 3060 Ti (README.md:38)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_batch8(
    radar, images, clouds, variant, max_cars, n_frames, size_desc="armor@640",
    weights_mode="random", background=None, bucket=None,
) -> int:
    """8-camera batched throughput: frames/sec/chip (BASELINE.json metric).

    Uses the fully-fused device-tracked batch step (detect + locate + track
    for all 8 cameras is ONE XLA program; vmapped on-device tracker) — there
    is no per-camera host work on the timed path.
    """
    import time

    import jax
    import numpy as np

    from rm_radar_tpu.utils.io import pad_points

    b = 8
    # BENCH_ROTATE=N (default 1): number of distinct 8-camera scene stacks
    # the timed loop rotates through. 1 = the round-3 definition (content-
    # static steps: pure drift-immune device throughput); N>1 varies the
    # content per step so bucket occupancy / scene-dependent work moves
    # inside the timed region (closer to a serving simulation; VERDICT r3
    # weak #4). Stacks are cyclic shifts of the scene pool, so every scene
    # appears in every stack and the per-step work is comparable.
    n_rot = max(int(os.environ.get("BENCH_ROTATE", "1")), 1)
    stacks = []
    for r in range(n_rot):
        imgs_r = jax.device_put(
            np.stack(
                [
                    np.ascontiguousarray(images[(i + r) % len(images)])
                    for i in range(b)
                ]
            )
        )
        clds_r = jax.device_put(
            np.stack(
                [
                    pad_points(
                        clouds[(i + r) % len(clouds)],
                        radar.config.locator.max_points,
                    )
                    for i in range(b)
                ]
            )
        )
        stacks.append((imgs_r, clds_r))
    imgs, clds = stacks[0]
    n_steps = max(n_frames // b, 5)
    # Pre-stage per-step timestamps (one tiny device array per step): H2D in
    # this dev environment has ~24 ms RTT, which must stay off the timed path.
    ts_dev = [
        jax.device_put(np.full((b,), 1.0 + 0.1 * i, np.float32))
        for i in range(n_steps)
    ]
    # Warmup timestamp strictly BEFORE the timed sequence: tracks spawned
    # during the compile step must have dt > 0 at timed step 0 (a later
    # warmup timestamp would Singer-predict every track backwards in time).
    ts_warm = jax.device_put(np.full((b,), 0.5, np.float32))
    jax.block_until_ready([imgs, clds, ts_dev, ts_warm])
    carries = radar.make_batch_tracked_state(b)
    # The armor stage runs at the workload-fit ``bucket`` while the car
    # stage counts survivors at the full config.max_cars capacity, so
    # n_cars > bucket below is TRUE clipping, not a full-but-exact frame.
    bucket = bucket or radar.config.detector.max_cars
    step = radar.batch_step(tracked=True, max_cars=bucket)
    t0 = time.perf_counter()
    if background is not None:
        # Prime the background depth model (SampleRadar::updateBackgroundCloud
        # equivalent): black frames + the empty-field cloud, timestamped
        # before the timed sequence. Without this the background is built
        # from the frames themselves and car pixels never become foreground.
        # A background bigger than the cloud capacity is fed in chunks (the
        # background is a running max, so coverage accumulates).
        import jax.numpy as jnp

        cap = radar.config.locator.max_points
        chunks = [
            background[i : i + cap] for i in range(0, len(background), cap)
        ]
        black = jnp.zeros_like(imgs)
        k = 0
        for _ in range(radar.config.locator.queue_size):
            for chunk in chunks:
                bg_clds = jax.device_put(
                    np.stack([pad_points(chunk, cap)] * b)
                )
                carries, batch = step(
                    carries,
                    black,
                    bg_clds,
                    jax.device_put(np.full((b,), 0.1 + 0.02 * k, np.float32)),
                )
                k += 1
        _ = np.asarray(batch.confidence)
    carries, batch = step(carries, imgs, clds, ts_warm)
    _ = np.asarray(batch.confidence)  # force execution (block can be lazy)
    log(f"batch8 tracked compile+prime+first: {time.perf_counter() - t0:.1f}s")

    # Force execution of every step without serializing on it: start an
    # async host copy of one output leaf per step and consume them all at
    # the end (block_until_ready alone is lazy on remote backends; an eager
    # checksum op would add a host round trip into the chain).
    if n_rot > 1:  # warm every stack's content off the clock (timestamps
        # strictly increasing below the timed sequence's 1.0 start)
        for k, (imgs_r, clds_r) in enumerate(stacks[1:]):
            ts_k = jax.device_put(
                np.full((b,), 0.5 + 0.4 * (k + 1) / n_rot, np.float32)
            )
            carries, batch = step(carries, imgs_r, clds_r, ts_k)
        _ = np.asarray(batch.confidence)
    t0 = time.perf_counter()
    handles = []
    for i in range(n_steps):
        imgs_i, clds_i = stacks[i % n_rot]
        carries, batch = step(carries, imgs_i, clds_i, ts_dev[i])
        batch.confidence.copy_to_host_async()
        handles.append(batch.confidence)
    for h in handles:
        _ = np.asarray(h)
    dt = (time.perf_counter() - t0) / n_steps
    fps = b / dt
    log(f"batch8: {dt * 1e3:.2f} ms/step -> {fps:.1f} frames/sec/chip")
    # Occupancy telemetry from the final step's full RobotBatch: how much of
    # the locate/track path actually ran (detected cars that were located,
    # and live track states) — guards against benchmarking locate/track at
    # trivial occupancy (uncorrelated clouds would locate ~nothing).
    full = jax.device_get(batch)
    det = full.detected & full.valid
    loc = det & full.located
    trk = det & (full.track_state >= 0)
    n_det = int(det.sum())
    n_cars = np.asarray(full.n_cars)
    n_clipped = int((n_cars > bucket).sum())
    n_at_cap = int((n_cars == bucket).sum())
    nms_car = int(np.max(np.asarray(full.nms_candidates_car)))
    nms_armor = int(np.max(np.asarray(full.nms_candidates_armor)))
    top_k = radar.detector.car.config.nms_top_k
    log(
        f"occupancy: detected={n_det} located={int(loc.sum())} "
        f"tracked={int(trk.sum())} "
        f"located-rate={int(loc.sum()) / max(n_det, 1):.2f} "
        f"cameras-clipped={n_clipped}/8 (n_cars counted at full capacity "
        f"{radar.config.detector.max_cars}; >0 means the bucket {bucket} "
        f"dropped detections) cameras-at-bucket-capacity={n_at_cap}/8 "
        f"(full but exact)"
    )
    log(
        f"nms saturation: max candidates car={nms_car} armor={nms_armor} "
        f"of top_k={top_k}"
        + (
            " *** ALARM: top-K NMS pool saturated — semantics diverge "
            "from all-pairs NMS; raise nms_top_k ***"
            if max(nms_car, nms_armor) >= top_k
            else ""
        )
    )
    if n_clipped:
        log(
            "*** ALARM: bucket clipped detections on the headline run — "
            "raise BENCH_BATCH_MAX_CARS or use run_stream_batch buckets ***"
        )
    if radar.config.detector.car_tile_topk > 0:
        # LiDAR-gated tile telemetry (off the timed path): re-derive each
        # camera's final diff image from its carry and count foreground
        # blocks the top-K selection left uncovered — nonzero means the
        # gate would have dropped something the LiDAR saw.
        from rm_radar_tpu.locate import locator as locate_mod

        k = radar.config.detector.car_tile_topk
        sel = radar._tile_selector(imgs.shape[1:])
        loc_states = carries[0] if isinstance(carries, tuple) else carries
        lc = radar.config.locator

        @jax.jit
        def _gate_stats(states):
            def one(s):
                diff = locate_mod.diff_from_state(s, lc)
                fg = locate_mod.cluster(
                    diff, radar.locator.calib, lc, candidates=s
                )
                _, unc, guar = sel.select_clusters(fg, k)
                return unc, guar

            return jax.vmap(one)(states)

        unc, guar = (
            np.asarray(x) for x in jax.device_get(_gate_stats(loc_states))
        )
        log(
            f"tile gate: top-{k} of {sel.n_tiles} tiles/camera "
            f"(cluster-aware), uncovered foreground blocks per camera "
            f"(final step) = {unc.tolist()}, guaranteed cluster tiles = "
            f"{guar.tolist()}"
            + (
                " *** ALARM: the tile gate dropped LiDAR-visible "
                "foreground — raise BENCH_TILE_TOPK ***"
                if int(unc.sum()) > 0
                else ""
            )
            + (
                f" *** ALARM: more cluster tiles than slots (max "
                f"{int(guar.max())} > K={k}) — some cluster lost its "
                "guaranteed tile ***"
                if int(guar.max(initial=0)) > k
                else ""
            )
        )
    print(
        json.dumps(
            {
                "metric": "frames/sec/chip at batch-8 multi-camera, device-"
                f"tracked (2592x2048, yolov8{variant} cascade, "
                f"{size_desc}, {max_cars}-car armor batch, "
                f"{weights_mode} weights)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / (1000.0 / BASELINE_MS), 3),
            }
        )
    )
    return 0


def main() -> int:
    import jax

    # Persistent compilation cache: the TPU analogue of the reference's
    # serialized-engine cache (detector.cpp:74-99).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rm_radar_tpu.configs import (
        LocatorConfig,
        RadarConfig,
        RobotDetectorConfig,
    )
    from rm_radar_tpu.pipeline import Radar
    from rm_radar_tpu.types import Frame
    from rm_radar_tpu.utils.io import load_asset_sequence

    n_frames = int(os.environ.get("BENCH_FRAMES", "80"))
    max_cars = int(os.environ.get("BENCH_MAX_CARS", "8"))
    variant = os.environ.get("BENCH_VARIANT", "m")
    armor_size = int(os.environ.get("BENCH_ARMOR_SIZE", "256"))
    # Locate-stage capacities fit to the declared workload (reference clouds
    # are 10,000 points, SURVEY.md §2.6; correlated synth clouds peak ~750
    # foreground points), each validated by an interleaved batch-8 A/B
    # (PERF.md round 3) with located-rate telemetry guarding correctness.
    max_fg = int(os.environ.get("BENCH_MAX_FG", "1024"))
    max_points = int(os.environ.get("BENCH_MAX_POINTS", "10240"))
    tiled = os.environ.get("BENCH_TILED", "0") == "1"

    log(f"devices: {jax.devices()}")

    repo = os.path.dirname(os.path.abspath(__file__))
    # Car-stage input (reference 640). 512 ships as the default: the
    # size-matched hard-mix checkpoint measures BETTER than 640 on every
    # accuracy tier (easy mAP .971 vs .933, 24-scene hard mAP .886 vs
    # .726 — tighter boxes at the smaller letterbox) and -0.33 ms/frame
    # in the interleaved batch-8 A/B (PERF.md round 3).
    car_size = int(os.environ.get("BENCH_CAR_SIZE", "512"))
    car_w = os.path.join(
        repo,
        "assets/models",
        f"car_synth_{variant}.npz"
        if car_size == 640
        else f"car_synth_{variant}_{car_size}.npz",
    )
    armor_w = os.path.join(
        repo,
        "assets/models",
        f"armor_synth_{variant}.npz"
        if armor_size == 640
        else f"armor_synth_{variant}_{armor_size}.npz",
    )
    weights_mode = os.environ.get("BENCH_WEIGHTS") or (
        "synth"
        if os.path.exists(car_w) and os.path.exists(armor_w)
        else "random"
    )

    asset_dir = "/root/reference/assets"
    if os.path.isdir(asset_dir):
        images, clouds, background = load_asset_sequence(asset_dir)
    else:  # synthetic fallback with identical shapes
        rng = np.random.default_rng(0)
        images = [
            rng.integers(0, 255, size=(2048, 2592, 3), dtype=np.uint8)
            for _ in range(10)
        ]
        clouds = [
            rng.uniform(1000, 25000, size=(10000, 3)).astype(np.float32)
            for _ in range(10)
        ]
        background = None

    car_variables = armor_variables = None
    if weights_mode == "synth":
        # Real trained weights need frames whose content matches their
        # training distribution, so the car counts / crop sizes / bucket
        # escalation the timed loop sees are the actual workload's (the
        # reference's number also comes from real weights on real frames,
        # README.md:38). Clouds are generated FROM the scene geometry
        # (points on the cars, in front of a terrain background — see
        # train/synth.py::make_scene_cloud), so locate/search/track run at
        # realistic occupancy, like the reference's matched image+cloud
        # pairs (samples/main.cpp:74-99); the located-rate telemetry below
        # verifies it.
        from rm_radar_tpu.models.weights import load_variables
        from rm_radar_tpu.train.synth import (
            make_background_cloud,
            make_scene,
            make_scene_cloud,
        )

        car_variables = load_variables(car_w)
        armor_variables = load_variables(armor_w)
        rng = np.random.default_rng(7)
        # Tiled mode exists for the small-robot regime (the reference's own
        # frames: median car 62 px native). Its scenes render car extents
        # 40-170 px — inside the tile-level training distribution and small
        # enough that the 192 px tile overlap guarantees every car is seen
        # whole by some tile (objects > overlap - 2*margin can be border-
        # suppressed everywhere; 660 px cars would be, so the letterboxed
        # headline keeps its own large-car scenes).
        car_px = (40, 170) if tiled else (180, 660)
        scenes = [
            make_scene(rng, 2048, 2592, max_cars=6, car_size=car_px)
            for _ in range(10)
        ]
        images = [s.image for s in scenes]
        clouds = [make_scene_cloud(rng, s) for s in scenes]
        background = make_background_cloud(rng, 2048, 2592)
    log(f"weights: {weights_mode}")

    config = RadarConfig(
        detector=RobotDetectorConfig(
            max_cars=max_cars,
            input_width=car_size,
            input_height=car_size,
            armor_input_width=armor_size,
            armor_input_height=armor_size,
            crop_window=int(os.environ.get("BENCH_CROP_WINDOW", "768")),
            car_tile=car_size if tiled else 0,
            car_tile_topk=(
                int(os.environ.get("BENCH_TILE_TOPK", "0")) if tiled else 0
            ),
        ),
        locator=LocatorConfig(max_foreground=max_fg, max_points=max_points),
    )
    radar = Radar(
        config,
        car_variant=variant,
        armor_variant=variant,
        car_variables=car_variables,
        armor_variables=armor_variables,
    )
    size_desc = (
        f"armor@{armor_size}"
        if car_size == 640
        else f"car@{car_size}, armor@{armor_size}"
    )
    if tiled:
        size_desc = f"car TILED {car_size}px/ov192, armor@{armor_size}"
        topk = config.detector.car_tile_topk
        if topk:
            size_desc += f", lidar-gated top-{topk} tiles"

    if os.environ.get("BENCH_MODE", "batch8") == "batch8":
        # The armor bucket is fit to the workload's max car count (synth
        # scenes carry <= 6 cars; the reference's dynamic batch likewise ran
        # the actual car count, detector.cpp:208-227) while the car stage
        # probes at the full max_cars capacity — so the clipping telemetry
        # below is unambiguous: n_cars > bucket = real dropped detections,
        # n_cars == bucket = full but exact.
        # Default 7: the bench scenes carry <= 6 ground-truth cars, but the
        # shipped checkpoint's NMS yields a 7th survivor on one scene — the
        # round-4 true-count telemetry caught bucket 6 actually clipping it
        # (cameras-clipped=1/8). The reference never drops a detection, so
        # the honest fixed bucket covers the detected count, not the truth.
        batch_cars = int(
            os.environ.get(
                "BENCH_BATCH_MAX_CARS",
                "7" if weights_mode == "synth" else str(max_cars),
            )
        )
        return bench_batch8(
            radar, images, clouds, variant, batch_cars, n_frames, size_desc,
            weights_mode, background=background, bucket=batch_cars,
        )

    buckets_env = os.environ.get("BENCH_BUCKETS", "4")
    buckets = (
        tuple(int(b) for b in buckets_env.split(",") if b)
        if buckets_env
        else None
    )
    prime_bucket = buckets[0] if buckets else None

    t0 = time.perf_counter()
    if background is not None:
        # Chunked: a background bigger than the cloud capacity accumulates
        # into the running-max model over several updates.
        cap = radar.config.locator.max_points
        for i in range(0, len(background), cap):
            radar.update_background_cloud(
                background[i : i + cap], max_cars=prime_bucket
            )
    else:
        # No background.pcd in the snapshot: prime the background model with
        # the first cloud (the background is a running max anyway).
        radar.update_background_cloud(clouds[0], max_cars=prime_bucket)
    log(f"background prime (compiles fused program): {time.perf_counter() - t0:.1f}s")

    # Pre-stage frames on device. This benchmarks the pipeline from
    # device-resident camera/LiDAR buffers: in this dev environment host<->
    # device goes through a network tunnel (~60 MB/s; a 16 MB frame costs
    # ~260 ms), whereas a production TPU host moves it over PCIe in ~1-3 ms,
    # comparable to the reference's H2D. The tunnel is an environment
    # artifact, not pipeline cost.
    from rm_radar_tpu.utils.io import pad_points

    dev_images = [jax.device_put(np.ascontiguousarray(im)) for im in images]
    dev_clouds = [
        jax.device_put(pad_points(c, radar.config.locator.max_points))
        for c in clouds
    ]
    jax.block_until_ready(dev_images)

    # Warmup through the same bucketed stream path the timed loop uses —
    # INCLUDING escalation: the frame with the most cars saturates the small
    # bucket during warmup, so the repair program and every reachable bucket
    # compile here, not inside the timed loop (with realistic car counts the
    # first saturating frame otherwise lands mid-sequence: a ~minute compile
    # spike recorded as a frame time).
    t0 = time.perf_counter()
    warm_frames = [
        Frame(
            image=dev_images[i % len(dev_images)],
            point_cloud=dev_clouds[i % len(dev_clouds)],
            timestamp=0.01 * (i + 1),
        )
        for i in list(range(len(dev_images))) + [0, 1]
    ]
    for _ in radar.run_stream(iter(warm_frames), buckets=buckets):
        pass
    log(
        f"warmup ({len(warm_frames)} frames, all scenes): "
        f"{time.perf_counter() - t0:.1f}s"
    )

    # Pipelined loop (run_stream): the steady-state per-frame cost, like the
    # reference's avg-per-frame over its sample loop.
    def frame_gen():
        for i in range(n_frames):
            yield Frame(
                image=dev_images[i % len(images)],
                point_cloud=dev_clouds[i % len(clouds)],
                timestamp=1.0 + 0.1 * i,
            )

    times = []
    stream_stats: dict = {}
    # Pipeline depth 3: one extra in-flight frame absorbs this link's
    # latency hiccups (interleaved A/B, both pairs: 9.0 vs 11.6 and 11.4 vs
    # 18.8 ms p50 against depth 2). The library default stays 2 — depth
    # trades result lag for smoothness, and only the bench prefers
    # throughput unconditionally.
    depth = int(os.environ.get("BENCH_DEPTH", "3"))
    n_det = n_loc = n_trk = 0
    t_prev = time.perf_counter()
    for robots in radar.run_stream(
        frame_gen(), depth=depth, buckets=buckets, stats=stream_stats
    ):
        now = time.perf_counter()
        times.append(now - t_prev)
        t_prev = now
        for r in robots:
            if r.is_detected:
                n_det += 1
                n_loc += bool(r.is_located)
                n_trk += bool(r.is_tracked)

    times_ms = np.asarray(times[1:]) * 1e3  # drop pipeline fill
    p50 = float(np.percentile(times_ms, 50))
    p99 = float(np.percentile(times_ms, 99))
    log(
        f"frames={n_frames} p50={p50:.2f}ms p99={p99:.2f}ms "
        f"mean={times_ms.mean():.2f}ms min={times_ms.min():.2f}ms "
        f"(variant={variant}, max_cars={max_cars})"
    )
    flog = stream_stats.pop("frame_log", [])
    log(f"stream stats: {stream_stats}")
    log(
        f"occupancy: detected={n_det} located={n_loc} tracked={n_trk} "
        f"located-rate={n_loc / max(n_det, 1):.2f}"
    )
    if flog:
        # p99 decomposition: how much of the tail is the blocking result
        # fetch (link RTT on this tunnel) and the repair block (2 extra
        # round trips + one extra cascade) vs device pipeline time.
        fetch = np.asarray([f[2] for f in flog])
        rep_frames = [f for f in flog if f[1] > 0]
        rep_ms = np.asarray([f[3] for f in rep_frames])
        log(
            f"p99 decomposition: fetch_ms p50={np.percentile(fetch, 50):.2f} "
            f"p99={np.percentile(fetch, 99):.2f} max={fetch.max():.2f}; "
            f"repair frames={len(rep_frames)}"
            + (
                f" repair_ms mean={rep_ms.mean():.2f} max={rep_ms.max():.2f}"
                if len(rep_frames)
                else ""
            )
        )

    bucket_desc = (
        f"armor buckets {'/'.join(map(str, buckets))}->{max_cars}"
        if buckets
        else f"{max_cars}-car armor batch"
    )
    print(
        json.dumps(
            {
                "metric": "detect+locate+track ms/frame p50 (2592x2048, "
                f"yolov8{variant} cascade, {size_desc}, {bucket_desc}, "
                f"{weights_mode} weights)",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / p50, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
