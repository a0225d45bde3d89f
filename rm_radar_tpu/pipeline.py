"""End-to-end radar pipeline: detect + locate on device, track on host.

Equivalent of the reference sample app (samples/sample_radar.h:106-127),
which overlaps `detect` (GPU) and `update+cluster` (CPU threads) with
std::async, then joins for `search` and `update`. On TPU the overlap problem
disappears: detect and locate are ONE fused jit program — XLA schedules the
YOLO cascade and the point-cloud pipeline together on the same chip with no
host round-trip in between. The only device->host transfer per frame is the
compact RobotBatch (a few KB), after which the branch-heavy SORT lifecycle
runs on host exactly where it belongs.

Multi-camera scale-out: `run_batch` vmaps the fused step over a camera batch;
`parallel.mesh` shards that batch across TPU chips over ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import RadarConfig
from .detect.detector import RobotDetector
from .locate import locator as locate_mod
from .locate.locator import Locator, LocatorState
from .track.tracker import RobotObservation, Tracker
from .types import Frame, RobotBatch, TrackState
from .utils.io import pad_points


@dataclasses.dataclass
class Robot:
    """Host-side fused robot record (reference src/robot/robot.h:53-164)."""

    rect: Optional[np.ndarray] = None  # [4] xywh full-image pixels
    label: Optional[int] = None
    confidence: Optional[float] = None
    armors: Optional[np.ndarray] = None  # [A, 6] x,y,w,h,label,conf
    location: Optional[np.ndarray] = None  # [3] meters
    track_state: Optional[TrackState] = None

    @property
    def is_detected(self) -> bool:
        return self.armors is not None and len(self.armors) > 0

    @property
    def is_located(self) -> bool:
        return self.location is not None

    @property
    def is_tracked(self) -> bool:
        return self.track_state is not None


def _enable_compilation_cache() -> None:
    """Turn on XLA's persistent compilation cache (idempotent).

    Plays the role of the reference's serialized-engine cache
    (detector.cpp:74-99): the first run compiles, later processes load the
    compiled programs from disk. Opt out with JAX_COMPILATION_CACHE_DIR="".
    """
    import os

    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache"
    )
    if not path:
        return
    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass  # cache is an optimization, never a requirement


class Radar:
    """Full pipeline owner (SampleRadar equivalent)."""

    def __init__(
        self,
        config: RadarConfig | None = None,
        car_variant: str = "m",
        armor_variant: str = "m",
        car_variables: Any = None,
        armor_variables: Any = None,
        dtype: Any = jnp.bfloat16,
    ):
        _enable_compilation_cache()
        self.config = config or RadarConfig()
        self.detector = RobotDetector(
            self.config.detector,
            car_variant,
            armor_variant,
            car_variables,
            armor_variables,
            dtype,
        )
        self.locator = Locator(self.config.locator, self.config.calibration)
        self.tracker = Tracker(self.config.tracker)
        self._jitted = {}
        self._tile_selectors = {}

    def _tile_selector(self, image_shape):
        """Per-image-shape TileSelector (static masks) for the LiDAR-gated
        tiled car stage; built lazily at trace time."""
        from .detect.tile_select import TileSelector

        src_h, src_w = int(image_shape[0]), int(image_shape[1])
        key = (src_h, src_w)
        if key not in self._tile_selectors:
            d = self.config.detector
            self._tile_selectors[key] = TileSelector(
                src_h,
                src_w,
                d.car_tile,
                d.car_tile_overlap,
                d.tile_border_margin,
                self.config.locator.zoom_factor,
            )
        return self._tile_selectors[key]

    # ---------------------------------------------------------------- fused

    def _frame_fn(
        self,
        state: LocatorState,
        image,
        points,
        max_cars: int | None = None,
        crop_window: int | None = None,
    ):
        """One fused device step: cascade detect + locate update/cluster/search.

        Returns (robots, state, fg). The compact Foreground is returned so a
        bucket-saturated frame can be *repaired* — re-detected at a bigger
        armor bucket and re-searched against the same foreground — without
        re-running the locate update (which would double-push the depth
        queue). Callers that never repair just drop it.

        With ``car_tile_topk`` (LiDAR-gated tiled mode) the stages reorder
        to locate-first: update/cluster are detection-independent, and the
        clustered foreground's diff image is exactly the tile-selection
        signal (detect/tile_select.py). Selection is recomputed from the
        saved Foreground in :meth:`_repair_fn`, so repairs see the same
        tiles deterministically.
        """
        d_cfg = self.config.detector
        topk = d_cfg.car_tile > 0 and d_cfg.car_tile_topk > 0
        state, diff = locate_mod.update(
            state, points, self.locator.calib, self.config.locator
        )
        fg = locate_mod.cluster(
            diff,
            self.locator.calib,
            self.config.locator,
            candidates=state,  # static dedup3 flag checked vs the config
        )
        tile_indices = None
        if topk:
            idx, _, _ = self._tile_selector(image.shape).select_clusters(
                fg, d_cfg.car_tile_topk
            )
            tile_indices = idx
        robots = self.detector.detect_fn(
            image,
            max_cars=max_cars,
            crop_window=crop_window,
            tile_indices=tile_indices,
        )
        robots = locate_mod.search(
            robots, fg, self.locator.calib, self.config.locator
        )
        return robots, state, fg

    def _repair_fn(self, image, fg, max_cars: int):
        """Re-run detect at a bigger bucket + search against a saved
        Foreground: produces exactly what the frame program would have
        produced at that bucket (detection results are bucket-independent,
        detect/detector.py:detect_fn; locate state does not depend on the
        bucket). In LiDAR-gated tiled mode the tile selection is recomputed
        from the saved Foreground's diff image — deterministic, so the
        repair sees exactly the frame program's tiles."""
        d_cfg = self.config.detector
        tile_indices = None
        if d_cfg.car_tile > 0 and d_cfg.car_tile_topk > 0:
            sel = self._tile_selector(image.shape)
            tile_indices, _, _ = sel.select_clusters(
                fg, d_cfg.car_tile_topk
            )
        robots = self.detector.detect_fn(
            image, max_cars=max_cars, tile_indices=tile_indices
        )
        return locate_mod.search(
            robots, fg, self.locator.calib, self.config.locator
        )

    def _frame_fn_tracked(
        self,
        carry,
        image,
        points,
        timestamp,
        crop_window: int | None = None,
        max_cars: int | None = None,
    ):
        """Fully fused step including the batched on-device tracker: the
        whole detect+locate+track frame is ONE XLA program; the host only
        formats results. Tracking semantics are identical to the host
        tracker (see tests/test_device_tracker.py)."""
        from .track import device_tracker as dtrack

        loc_state, store = carry
        robots, loc_state, _ = self._frame_fn(
            loc_state, image, points, max_cars=max_cars,
            crop_window=crop_window,
        )
        store, robots = dtrack.update(
            store, robots, timestamp, self.config.tracker
        )
        return (loc_state, store), robots

    def _get_jitted(self, key, fn, donate: bool = True):
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                fn, donate_argnums=(0,) if donate else ()
            )
        return self._jitted[key]

    # ------------------------------------------- fully-device tracked loop

    def make_tracked_state(self):
        from .track import device_tracker as dtrack

        return (
            locate_mod.make_state(self.config.locator),
            dtrack.make_store(self.config.tracker),
        )

    def run_once_tracked(self, frame: Frame, carry=None):
        """One fully-on-device frame (detect+locate+track in one program).

        Returns (robots, carry). Carry is (LocatorState, TrackStore); pass
        it back on the next call. Output robots carry track-filled labels,
        locations and states straight from the device.
        """
        if carry is None:
            carry = self.make_tracked_state()
        image, points = self._prepare_inputs(frame)
        key = ("tracked", tuple(image.shape))
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                self._frame_fn_tracked, donate_argnums=(0,)
            )
        carry, batch = self._jitted[key](
            carry, image, points, float(frame.timestamp or 0.0)
        )
        host = RobotBatch(*jax.device_get(tuple(batch)))
        return self._format_host(host), carry

    def _format_host(self, host: RobotBatch) -> List[Robot]:
        """Host formatting of a track-complete RobotBatch (no tracking)."""
        robots: List[Robot] = []
        for i in range(host.valid.shape[0]):
            if not host.valid[i]:
                continue
            det = bool(host.detected[i])
            armor_rows = None
            if det:
                am = host.armor_valid[i]
                armor_rows = np.concatenate(
                    [
                        host.armor_xywh[i][am],
                        host.armor_label[i][am, None].astype(np.float32),
                        host.armor_conf[i][am, None],
                    ],
                    axis=-1,
                )
            state = int(host.track_state[i])
            label = int(host.label[i])
            robots.append(
                Robot(
                    rect=host.rect[i].copy(),
                    label=label if label >= 0 else None,
                    confidence=float(host.confidence[i]) if det else None,
                    armors=armor_rows,
                    location=(
                        host.location[i].copy()
                        if bool(host.located[i])
                        else None
                    ),
                    track_state=TrackState(state) if state >= 0 else None,
                )
            )
        return robots

    # ------------------------------------------------------- multi-camera

    def make_batch_state(self, n_cameras: int):
        """Per-camera locator states stacked on a leading batch axis."""
        one = locate_mod.make_state(self.config.locator)
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_cameras,) + x.shape).copy(), one
        )

    def make_batch_tracked_state(self, n_cameras: int):
        """(locator states, track stores) with a leading camera axis, for
        batch_step(tracked=True)."""
        one = self.make_tracked_state()
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_cameras,) + x.shape).copy(), one
        )

    def batch_step(
        self,
        mesh=None,
        tracked: bool = False,
        max_cars: int | None = None,
        donate: bool = True,
    ):
        """Jitted fused step over a camera batch: vmap of the per-frame
        program; with a mesh, the camera axis is sharded over DATA_AXIS so
        each chip runs its cameras' pipelines locally (ICI only touches the
        initial placement — there is no cross-camera communication).

        ``tracked=False``: fn(states, images [B,H,W,3] u8, points [B,N,3])
        -> (new states, RobotBatch with leading camera axis); tracking is
        the caller's job (host trackers). Both modes return the carry
        FIRST (the lax.scan convention) — they used to differ, which made
        switching modes a silent pytree-swap trap.

        ``tracked=True``: the batched on-device tracker runs inside the same
        program (vmap of the fully-fused frame over cameras) — fn(carries,
        images, points, timestamps [B]) -> (new carries, RobotBatch with
        track fields filled). carries = (locator states, track stores), both
        with a leading camera axis (see make_batch_tracked_state).

        ``max_cars``: armor-batch bucket for this program (default
        config.max_cars); the returned RobotBatch has that many slots while
        ``n_cars`` stays the true full-capacity count, so clipping is
        detectable per camera (``n_cars > max_cars``). ``donate=False``
        keeps the input carries alive — required by callers that may replay
        a tick from a saved carry (run_stream_batch bucket repair).
        """
        # crop_window=0 under vmap: the batch-level window cond would become
        # a select executing BOTH crop paths per camera (see detect_fn).
        if tracked:
            fn = jax.vmap(
                lambda c, i, p, t: self._frame_fn_tracked(
                    c, i, p, t, crop_window=0, max_cars=max_cars
                )
            )
        else:
            fn = jax.vmap(
                lambda s, i, p: tuple(
                    reversed(
                        self._frame_fn(
                            s, i, p, max_cars=max_cars, crop_window=0
                        )[:2]
                    )
                )
            )
        donate_argnums = (0,) if donate else ()
        if mesh is None:
            return jax.jit(fn, donate_argnums=donate_argnums)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import DATA_AXIS

        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(
            fn,
            in_shardings=(
                (batch_sharding,) * (4 if tracked else 3)
            ),
            out_shardings=(batch_sharding, batch_sharding),
            donate_argnums=donate_argnums,
        )

    def run_batch(
        self,
        images: np.ndarray,
        clouds: np.ndarray,
        timestamps,
        states=None,
        trackers=None,
        mesh=None,
    ):
        """Host convenience: one multi-camera step + per-camera tracking.

        images: [B, H, W, 3] uint8; clouds: [B, N, 3] mm (padded);
        timestamps: [B] seconds. Returns (list of per-camera robot lists,
        states, trackers).
        """
        b = images.shape[0]
        if states is None:
            states = self.make_batch_state(b)
        if trackers is None:
            trackers = [Tracker(self.config.tracker) for _ in range(b)]
        # The mesh is part of the key: the same image shape compiled for a
        # different mesh must not reuse the first mesh's sharded program.
        key = ("batch", images.shape, mesh)
        if key not in self._jitted:
            self._jitted[key] = self.batch_step(mesh)
        states, batch = self._jitted[key](states, images, clouds)
        host = jax.tree_util.tree_map(np.asarray, batch)
        results = []
        for i in range(b):
            cam = jax.tree_util.tree_map(lambda x: x[i], host)
            saved = self.tracker
            self.tracker = trackers[i]
            try:
                results.append(
                    self._collect_host(cam, float(timestamps[i]))
                )
            finally:
                self.tracker = saved
        return results, states, trackers

    def run_batch_tracked(
        self,
        images: np.ndarray,
        clouds: np.ndarray,
        timestamps,
        carries=None,
        mesh=None,
    ):
        """Multi-camera step with the batched on-device tracker: the whole
        detect+locate+track frame for all B cameras is ONE XLA program — no
        per-camera host loop (the host only formats results).

        images: [B, H, W, 3] uint8; clouds: [B, N, 3] mm (padded);
        timestamps: [B] seconds. Returns (list of per-camera robot lists,
        carries). Pass ``carries`` back on the next call.
        """
        b = images.shape[0]
        if carries is None:
            carries = self.make_batch_tracked_state(b)
        key = ("batch_tracked", images.shape, mesh)
        if key not in self._jitted:
            self._jitted[key] = self.batch_step(mesh, tracked=True)
        ts = jnp.asarray(np.asarray(timestamps, np.float32))
        carries, batch = self._jitted[key](carries, images, clouds, ts)
        host = RobotBatch(*jax.device_get(tuple(batch)))
        results = [
            self._format_host(
                jax.tree_util.tree_map(lambda x: x[i], host)
            )
            for i in range(b)
        ]
        return results, carries

    def run_stream_batch(
        self, ticks, depth: int = 2, mesh=None, buckets=None, stats=None
    ):
        """Pipelined multi-camera serving loop (the bench's batch mode as a
        first-class API).

        ``ticks`` yields synchronized multi-camera frames: (images
        [B, H, W, 3] uint8, clouds [B, N, 3] mm zero-padded, timestamps [B]
        seconds) — host numpy or device-resident arrays. Each tick's full
        detect+locate+track for all B cameras is ONE fused XLA program
        (batch_step(tracked=True), the batched on-device tracker); dispatch
        runs ``depth`` ticks ahead of the blocking result fetch with
        ``copy_to_host_async`` started at dispatch, so device compute hides
        the device->host latency exactly as :meth:`run_stream` does per
        camera. Results are identical to calling :meth:`run_batch_tracked`
        per tick; only the schedule differs.

        ``buckets``: optional ascending armor-bucket ladder, as in
        :meth:`run_stream`. Ticks run at the current bucket; because
        ``n_cars`` is the TRUE car count (counted at full capacity,
        detect/detector.py), a camera with ``n_cars > bucket`` means its
        detections were actually clipped. Such a tick is **replayed**: the
        stream rolls back to the carry saved before the tick, re-runs it —
        and every younger in-flight tick — at the smallest covering bucket,
        and only then yields, so the on-device tracker never consumes a
        clipped frame. Results are therefore exactly what a fixed
        ``max_cars``-bucket stream would produce (the reference's dynamic
        batch never drops a detection, detector.cpp:208-227); the replay
        costs (1 + in-flight) extra fused steps on the rare overflow tick
        only. Enabling buckets keeps ``depth + 1`` carry snapshots alive
        (donation is disabled so a rollback source survives).

        ``stats``: optional dict filled with operational counters: ticks,
        per-bucket tick counts, replays, clipped_ticks (ticks where any
        camera overflowed — 0 when buckets=None means the fixed bucket was
        proven sufficient, the telemetry VERDICT r3 asked for),
        max_n_cars, and NMS saturation watermarks.

        With ``mesh``, the camera axis is sharded over the mesh's data axis
        (each chip serves B/n_devices cameras; there is no cross-camera
        communication). Yields per-tick lists of B per-camera robot lists.
        """
        import collections

        max_cars = self.config.detector.max_cars
        if buckets:
            bucket_list = tuple(
                sorted({int(x) for x in buckets if 0 < int(x) < max_cars})
            ) + (max_cars,)
        else:
            bucket_list = (max_cars,)
        repair = len(bucket_list) > 1
        cur = 0
        quiet = 0
        if stats is not None:
            stats.setdefault("ticks", 0)
            stats.setdefault("replays", 0)
            stats.setdefault("clipped_ticks", 0)
            stats.setdefault("escalations", 0)
            stats.setdefault("de_escalations", 0)
            stats.setdefault("bucket_ticks", {b: 0 for b in bucket_list})
            stats.setdefault("max_n_cars", 0)
            stats.setdefault("nms_candidates_car_max", 0)
            stats.setdefault("nms_candidates_armor_max", 0)

        carries = None
        pending = collections.deque()

        def step_fn(shape, bucket):
            key = ("batch_tracked", shape, mesh, bucket, repair)
            if key not in self._jitted:
                self._jitted[key] = self.batch_step(
                    mesh, tracked=True, max_cars=bucket, donate=not repair
                )
            return self._jitted[key]

        def dispatch(carry_in, images, clouds, ts, bucket):
            nonlocal carries
            carries, batch = step_fn(tuple(images.shape), bucket)(
                carry_in, images, clouds, ts
            )
            for leaf in batch:
                leaf.copy_to_host_async()
            return {
                "batch": batch,
                "b": int(images.shape[0]),
                "bucket": bucket,
                # Rollback source; kept only when repair is possible.
                "carry_before": carry_in if repair else None,
                "images": images if repair else None,
                "clouds": clouds if repair else None,
                "ts": ts if repair else None,
            }

        def consume_front():
            nonlocal cur, quiet
            while True:
                entry = pending.popleft()
                host = RobotBatch(*jax.device_get(tuple(entry["batch"])))
                n_max = int(np.max(np.asarray(host.n_cars)))
                bi = bucket_list.index(entry["bucket"])
                need = bi
                while (
                    n_max > bucket_list[need]
                    and need < len(bucket_list) - 1
                ):
                    need += 1
                if stats is not None:
                    stats["max_n_cars"] = max(stats["max_n_cars"], n_max)
                    stats["nms_candidates_car_max"] = max(
                        stats["nms_candidates_car_max"],
                        int(np.max(np.asarray(host.nms_candidates_car))),
                    )
                    stats["nms_candidates_armor_max"] = max(
                        stats["nms_candidates_armor_max"],
                        int(np.max(np.asarray(host.nms_candidates_armor))),
                    )
                    if n_max > bucket_list[bi]:
                        stats["clipped_ticks"] += 1
                if need == bi or not repair:
                    if stats is not None:
                        stats["ticks"] += 1
                        stats["bucket_ticks"][entry["bucket"]] += 1
                    prev = cur
                    if bi > cur:
                        cur, quiet = bi, 0
                    else:
                        cur, quiet = self._adjust_bucket(
                            n_max, bucket_list[bi], bucket_list, cur,
                            quiet, self.config.stream_deescalate_after,
                        )
                    if stats is not None and cur != prev:
                        stats[
                            "escalations" if cur > prev else "de_escalations"
                        ] += 1
                    b = entry["b"]
                    return [
                        self._format_host(
                            jax.tree_util.tree_map(lambda x: x[i], host)
                        )
                        for i in range(b)
                    ]
                # Rollback-replay: this tick and every younger in-flight
                # tick re-run from the saved carry at the covering bucket
                # (the on-device tracker must never consume clipped frames).
                if stats is not None:
                    stats["replays"] += 1
                cur = max(cur, need)
                replay = [entry] + list(pending)
                pending.clear()
                carry_in = entry["carry_before"]
                for e in replay:
                    pending.append(
                        dispatch(
                            carry_in,
                            e["images"],
                            e["clouds"],
                            e["ts"],
                            bucket_list[need],
                        )
                    )
                    carry_in = carries
                # Loop: re-fetch the replayed front tick (a younger tick
                # with even more cars re-triggers with a bigger bucket).

        for images, clouds, timestamps in ticks:
            b = int(images.shape[0])
            if carries is None:
                carries = self.make_batch_tracked_state(b)
            if repair:
                # Rollback needs the inputs again; commit them to the
                # device once (no-op for device-resident arrays).
                images = jax.device_put(images)
                clouds = jax.device_put(clouds)
            ts = jnp.asarray(np.asarray(timestamps, np.float32))
            pending.append(
                dispatch(carries, images, clouds, ts, bucket_list[cur])
            )
            if len(pending) > depth:
                yield consume_front()
        while pending:
            yield consume_front()

    # ----------------------------------------------------------------- host

    def update_background_cloud(
        self, cloud: np.ndarray, max_cars: int | None = None
    ) -> None:
        """Prime the background depth model from a pre-recorded cloud
        (SampleRadar::updateBackgroundCloud, sample_radar.h:90-99).

        Runs the *fused* frame program on a black image so no extra XLA
        program is compiled (the reference's updateBackgroundCloud likewise
        just calls Locator::update, including the queue push). Detection
        results are discarded. Pass ``max_cars`` to prime (and pre-compile)
        a specific armor bucket — e.g. the stream's starting bucket.
        """
        lc = self.config.locator
        image = np.zeros((lc.image_height, lc.image_width, 3), np.uint8)
        points = pad_points(cloud, lc.max_points)
        bucket = max_cars or self.config.detector.max_cars
        step = self._get_jitted(
            ("frame", tuple(image.shape), bucket),
            functools.partial(self._frame_fn, max_cars=bucket),
        )
        _, self.locator.state, _ = step(self.locator.state, image, points)

    def _prepare_inputs(self, frame: Frame):
        image = frame.image
        if isinstance(image, np.ndarray):
            image = np.ascontiguousarray(image)
        cloud = frame.point_cloud
        max_points = self.config.locator.max_points
        if cloud is None:
            cloud = np.zeros((max_points, 3), np.float32)
        elif isinstance(cloud, np.ndarray) and cloud.shape != (max_points, 3):
            cloud = pad_points(cloud, max_points)
        return image, cloud

    def run_once(self, frame: Frame) -> List[Robot]:
        """Process one frame end-to-end; returns host Robot records.

        ``frame.image`` / ``frame.point_cloud`` may be host numpy (transferred
        here) or already device-resident jax arrays (e.g. staged by a camera
        DMA pipeline) — the fused step consumes either.
        """
        image, points = self._prepare_inputs(frame)
        bucket = self.config.detector.max_cars
        step = self._get_jitted(
            ("frame", tuple(image.shape), bucket),
            functools.partial(self._frame_fn, max_cars=bucket),
        )
        batch, self.locator.state, _ = step(self.locator.state, image, points)
        return self._track_and_collect(batch, frame.timestamp or 0.0)

    def run_stream(self, frames, depth: int = 2, buckets=None, stats=None):
        """Pipelined frame loop: yields robot lists ``depth`` frames behind.

        Dispatches the fused step for upcoming frames before fetching earlier
        results, so the (possibly high-latency) device->host fetch and the
        host tracker overlap with device compute — the TPU equivalent of the
        reference's std::async detect/locate overlap (sample_radar.h:107-116).
        Results are identical to calling run_once per frame; only the
        schedule differs. ``depth`` bounds the in-flight frames (depth * RTT
        of latency hiding vs. ``depth`` frames of result lag).

        ``buckets``: optional ascending armor-batch capacities, e.g. (4, 20)
        — the TPU analogue of the reference's TensorRT optimization profile
        (min/opt/max = 1/4/20, detector.cpp:208-227; kOptBatchSize=4,
        sample_radar.h:34). Frames run in the smallest bucket; when a frame
        *overflows* its bucket (true car count > bucket — n_cars is counted
        at full capacity, so this is real clipping, not a full-but-exact
        frame) it is **repaired** — re-detected at the next bucket against
        the frame's saved foreground — before its results are yielded, and
        the stream escalates for subsequent frames (de-escalating after a
        quiet stretch). Output is therefore bit-identical to running every
        frame at the full max_cars capacity (the reference's dynamic batch
        likewise never drops cars, detector.cpp:208-227); the repair costs
        one extra cascade on the rare overflow frame only. None (default) =
        single max_cars bucket.

        ``stats``: optional dict the stream fills with operational counters
        (frames, repairs, escalations, de-escalations, per-bucket frame
        counts) — the observability hook behind the bench's tail-latency
        diagnosis (repair frames run the cascade twice, so they land in the
        p99, not the p50). It also collects a per-frame ``frame_log`` of
        (bucket, n_repairs, fetch_ms, repair_ms): fetch_ms is the blocking
        device->host result wait (link RTT + any not-yet-finished device
        work), repair_ms the full repair block including its extra round
        trips — the decomposition behind the p99 attribution in PERF.md.
        """
        import collections
        import time as _time

        max_cars = self.config.detector.max_cars
        if buckets:
            bucket_list = tuple(
                sorted({int(b) for b in buckets if 0 < int(b) < max_cars})
            ) + (max_cars,)
        else:
            bucket_list = (max_cars,)
        cur = 0
        quiet = 0
        if stats is not None:
            stats.setdefault("frames", 0)
            stats.setdefault("repairs", 0)
            stats.setdefault("escalations", 0)
            stats.setdefault("de_escalations", 0)
            stats.setdefault("bucket_frames", {b: 0 for b in bucket_list})
            # NMS-saturation watermarks: max anchors above conf_thresh seen
            # on either stage (exactness requires these stay < nms_top_k).
            stats.setdefault("nms_candidates_car_max", 0)
            stats.setdefault("nms_candidates_armor_max", 0)

        def consume(entry):
            nonlocal cur, quiet
            batch0, fg0, image0, ts0, b0 = entry
            t0 = _time.perf_counter()
            host = RobotBatch(*jax.device_get(tuple(batch0)))
            t_fetch = _time.perf_counter() - t0
            # Repair: n_cars is the TRUE car-NMS survivor count (counted at
            # full capacity, detect/detector.py), so n_cars > bucket means
            # detections were actually clipped — re-run detect+search at the
            # next bucket until the bucket covers the count or is at
            # capacity. Results then match fixed-capacity exactly.
            bi = bucket_list.index(b0)
            n_rep = 0
            if stats is not None:
                stats["frames"] += 1
                stats["bucket_frames"][b0] += 1
                stats["nms_candidates_car_max"] = max(
                    stats["nms_candidates_car_max"],
                    int(host.nms_candidates_car),
                )
                stats["nms_candidates_armor_max"] = max(
                    stats["nms_candidates_armor_max"],
                    int(host.nms_candidates_armor),
                )
            t0 = _time.perf_counter()
            # The true count names the right bucket directly — one repair
            # at the smallest covering bucket, not one per intermediate.
            while (
                int(host.n_cars) > bucket_list[bi]
                and bi < len(bucket_list) - 1
            ):
                bi += 1
            if bucket_list[bi] != b0:
                n_rep = 1
                if stats is not None:
                    stats["repairs"] += 1
                b_next = bucket_list[bi]
                repair = self._get_jitted(
                    ("repair", tuple(image0.shape), b_next),
                    functools.partial(self._repair_fn, max_cars=b_next),
                    donate=False,
                )
                batch0 = repair(image0, fg0)
                host = RobotBatch(*jax.device_get(tuple(batch0)))
            t_repair = _time.perf_counter() - t0 if n_rep else 0.0
            if stats is not None:
                stats.setdefault("frame_log", []).append(
                    (b0, n_rep, t_fetch * 1e3, t_repair * 1e3)
                )
            robots = self._collect_host(host, ts0)
            prev = cur
            if bi > cur:  # the repair proved the bigger bucket is needed
                cur, quiet = bi, 0
            else:
                cur, quiet = self._adjust_bucket(
                    int(host.n_cars), bucket_list[bi], bucket_list, cur,
                    quiet, self.config.stream_deescalate_after,
                )
            if stats is not None and cur != prev:
                stats["escalations" if cur > prev else "de_escalations"] += 1
            return robots

        # entries: (RobotBatch, Foreground, image, timestamp, bucket)
        pending = collections.deque()
        for frame in frames:
            image, points = self._prepare_inputs(frame)
            # Commit the frame to the device NOW and keep that handle: the
            # jitted step would transfer a host-numpy image anyway, but the
            # handle it creates is internal — a later *repair* of this frame
            # would re-upload all ~16 MB. With the committed handle in
            # ``pending``, a repair re-reads device memory (the reference
            # likewise reuses its pinned/device buffers, detector.cpp:
            # 132-148). No-op for already-device-resident inputs.
            image = jax.device_put(image)
            bucket = bucket_list[cur]
            step = self._get_jitted(
                ("frame", tuple(image.shape), bucket),
                functools.partial(self._frame_fn, max_cars=bucket),
            )
            batch, self.locator.state, fg = step(
                self.locator.state, image, points
            )
            # Start the device->host copy now; by the time this batch is
            # consumed (depth frames later) the data has already landed, so
            # the blocking fetch costs ~0 instead of a full link round trip.
            for leaf in batch:
                leaf.copy_to_host_async()
            pending.append((batch, fg, image, frame.timestamp or 0.0, bucket))
            if len(pending) > depth:
                yield consume(pending.popleft())
        while pending:
            yield consume(pending.popleft())

    @staticmethod
    def _adjust_bucket(
        n_robots, bucket_used, bucket_list, cur, quiet, deescalate_after=60
    ):
        """Escalate when a bucket fills; de-escalate after a quiet stretch
        of ``deescalate_after`` ticks (RadarConfig.stream_deescalate_after;
        env RM_RADAR_DEESCALATE_AFTER)."""
        if n_robots >= bucket_used and cur < len(bucket_list) - 1:
            return cur + 1, 0
        if cur > 0 and n_robots <= bucket_list[cur - 1] // 2:
            quiet += 1
            if quiet >= deescalate_after:
                return cur - 1, 0
        else:
            quiet = 0
        return cur, quiet

    def _track_and_collect(
        self, batch: RobotBatch, timestamp: float
    ) -> List[Robot]:
        """Fetch the compact RobotBatch, run the host tracker, and assemble
        reference-style Robot records."""
        # One device->host transfer for the whole pytree: per-leaf np.asarray
        # would pay one round trip per field (ruinous over high-latency
        # links; the reference's analogue is its single batched D2H,
        # detector.cu:549-551).
        host = RobotBatch(*jax.device_get(tuple(batch)))
        return self._collect_host(host, timestamp)

    def _collect_host(self, host: RobotBatch, timestamp: float) -> List[Robot]:
        class_num = self.config.tracker.class_num
        # Robot::feature (robot.cpp:102-122) on host numpy — tiny arrays,
        # avoids per-frame eager device dispatches.
        r, a = host.armor_label.shape
        one_hot = (
            host.armor_label[..., None] == np.arange(class_num)
        ) & host.armor_valid[..., None]
        feats = np.sum(
            one_hot * host.armor_conf[..., None], axis=1, dtype=np.float32
        )
        totals = feats.sum(axis=-1, keepdims=True)
        np.divide(feats, totals, out=feats, where=totals > 0)
        feats[~host.detected] = 0.0

        robots: List[Robot] = []
        observations: List[RobotObservation] = []
        for i in range(host.valid.shape[0]):
            if not host.valid[i]:
                continue
            det = bool(host.detected[i])
            locd = bool(host.located[i])
            obs = RobotObservation(
                detected=det,
                located=locd,
                label=int(host.label[i]) if det else None,
                feature=feats[i],
                location=host.location[i].copy() if locd else None,
            )
            armor_rows = None
            if det:
                am = host.armor_valid[i]
                armor_rows = np.concatenate(
                    [
                        host.armor_xywh[i][am],
                        host.armor_label[i][am, None].astype(np.float32),
                        host.armor_conf[i][am, None],
                    ],
                    axis=-1,
                )
            robots.append(
                Robot(
                    rect=host.rect[i].copy(),
                    label=int(host.label[i]) if det else None,
                    confidence=float(host.confidence[i]) if det else None,
                    armors=armor_rows,
                )
            )
            observations.append(obs)

        self.tracker.update(observations, timestamp)

        for robot, obs in zip(robots, observations):
            robot.label = obs.label
            robot.location = (
                None if obs.location is None else np.asarray(obs.location)
            )
            robot.track_state = (
                TrackState(obs.track_state)
                if obs.track_state != TrackState.NONE
                else None
            )
        return robots
