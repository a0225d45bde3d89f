"""Detector and RobotDetector: the two-stage car -> armor cascade.

Reference equivalents:

* ``radar::Detector`` (src/detect/detector.{h,cpp}) wraps one TensorRT engine
  with per-image CUDA streams, pinned buffers and an engine cache. Here a
  Detector is a Flax YOLOv8 + fused letterbox/decode/NMS compiled by XLA; the
  jit cache replaces the engine cache and batching replaces stream juggling.
* ``radar::RobotDetector`` (detector.cpp:377-455) crops each detected car on
  the host and runs a dynamic-batch armor inference. Here the crops never
  leave the device (fused gather, ops/preprocess.py) and the armor batch is a
  fixed ``max_cars`` capacity with a validity mask — the TPU answer to
  TensorRT's dynamic optimization profiles. Bucketed jit (1/4/8/max) trims
  wasted FLOPs when few cars are present.

The whole cascade — letterbox, car model, NMS, 20 fused crop+letterbox, armor
model, NMS, robot assembly and same-label dedup — is ONE jitted program with
no host round-trips.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DetectorConfig, RobotDetectorConfig
from ..geometry import union_iou
from ..models.yolov8 import create_model, init_params
from ..ops.detect_ops import nms, postprocess
from ..ops.preprocess import (
    letterbox,
    letterbox_crop,
    letterbox_crop_s2d,
    letterbox_s2d,
)
from ..types import Array, Detections, RobotBatch, TrackState


def _tile_starts(size: int, tile: int, stride: int) -> list:
    """Start offsets of a sliding ``tile`` window covering [0, size) with
    step ``stride``; the last tile is clamped flush to the far edge so the
    whole extent is covered with no short tile."""
    if tile >= size:
        return [0]
    if stride <= 0:
        raise ValueError(f"tile overlap >= tile size ({tile=}, {stride=})")
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return starts


class Detector:
    """Single-model detector: image(s) -> Detections in source coordinates.

    Construction mirrors the reference Detector parameters
    (src/detect/detector.h:87-93); TensorRT-only knobs are dropped.
    """

    def __init__(
        self,
        config: DetectorConfig,
        variant: str = "m",
        variables: Any = None,
        rng_seed: int = 0,
        dtype: Any = jnp.bfloat16,
    ):
        self.config = config
        self.model, self.model_cfg = create_model(
            variant=variant,
            num_classes=config.classes,
            input_size=(config.input_height, config.input_width),
            dtype=dtype,
        )
        if variables is None:
            variables = init_params(self.model, jax.random.PRNGKey(rng_seed))
        else:
            from ..models.weights import maybe_adapt_stem

            variables = maybe_adapt_stem(variables, self.model_cfg.s2d_stem)
        self.variables = variables
        # Interleaved same-session A/B (3 pairs, PERF.md): ON medians 10.27
        # vs OFF 11.37 ms/frame — at worst neutral, plausibly ~1 ms better
        # (it deletes the car-blob s2d transpose chain). Exact equivalence
        # is bit-tested; opt out with RM_RADAR_LETTERBOX_S2D=0.
        self.use_letterbox_s2d = (
            os.environ.get("RM_RADAR_LETTERBOX_S2D", "1") == "1"
        )
        # bf16 operands for the full-frame letterbox resample matmuls (f32
        # accumulation; same error bound as the crop path's matmul_dtype —
        # ~one uint8 level). NOTE: measured a non-lever — TPU matmuls
        # already run single-pass bf16 at default precision, so this only
        # halves operand staging traffic; the round-3 stage ablation shows
        # car letterbox+model+postprocess at 1.70 ms/frame ≈ the conv floor
        # (PERF.md round-3 table). Off by default; RM_RADAR_LETTERBOX_BF16=1
        # to experiment.
        self.letterbox_mm_dtype = (
            dtype
            if dtype == jnp.bfloat16
            and os.environ.get("RM_RADAR_LETTERBOX_BF16", "0") == "1"
            else None
        )
        # Banded lowering of the full-frame letterbox resample matmuls —
        # a DetectorConfig field (env default RM_RADAR_LETTERBOX_BAND,
        # validated in configs._env_int) so it is pinnable per-Detector in
        # code like the other measured lowerings. See
        # configs.DetectorConfig.letterbox_band for the A/B evidence.
        self.letterbox_band = config.letterbox_band
        self._jitted = {}

    def raw_forward(self, blobs: Array) -> Array:
        """[B, H, W, 3] float blobs -> [B, 4+classes, A] raw output."""
        return self.model.apply(self.variables, blobs)

    def detect_fn(
        self,
        image: Array,
        max_detections: int | None = None,
        with_stats: bool = False,
    ) -> Detections:
        """Pure single-image path (traceable): uint8 HWC BGR -> Detections.

        With an s2d-stem model and ``use_letterbox_s2d``, the blob is emitted
        directly in s2d layout by the 2D channel-encoded letterbox
        (ops/preprocess.letterbox_s2d) — the [H, W, 3] blob and its reshape/
        transpose chain never exist. On by default (interleaved end-to-end
        A/B measured it ahead; see PERF.md); set RM_RADAR_LETTERBOX_S2D=0
        to opt out.

        ``with_stats=True`` returns (Detections, n_candidates) where
        n_candidates is the above-conf_thresh anchor count entering NMS
        (saturation telemetry; see ops/detect_ops.postprocess).
        """
        cfg = self.config
        if self.use_letterbox_s2d and getattr(
            getattr(self.model, "cfg", None), "s2d_stem", False
        ):
            blob, pparam = letterbox_s2d(
                image,
                cfg.input_height,
                cfg.input_width,
                matmul_dtype=self.letterbox_mm_dtype,
                band_block=self.letterbox_band,
            )
            raw = self.model.apply(self.variables, blob[None], pre_s2d=True)[0]
        else:
            blob, pparam = letterbox(image, cfg.input_height, cfg.input_width)
            raw = self.model.apply(self.variables, blob[None])[0]
        return postprocess(
            raw,
            pparam,
            cfg.nms_thresh,
            cfg.conf_thresh,
            cfg.nms_top_k,
            max_detections if max_detections is not None else cfg.max_detections,
            with_candidate_count=with_stats,
        )

    def detect(self, image) -> Detections:
        """Host convenience API with a per-shape jit cache (the reference
        caches serialized engines per model; XLA's jit cache is per input
        shape). Accepts one image or a sequence of images — the reference's
        ImageOrImages concept (detector.h:70-77). Sequence images may have
        heterogeneous sizes (each is letterboxed independently, like the
        reference's per-image preprocess, detector.cu:439-502): images are
        grouped by shape, each group runs as one batch, and rows are
        reassembled in input order."""
        if isinstance(image, (list, tuple)):
            shapes = {tuple(im.shape) for im in image}
            if len(shapes) == 1:
                return self.detect_batch(np.stack(image))
            return self._detect_mixed(image)
        key = ("single", image.shape, image.dtype.str)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self.detect_fn)
        return self._jitted[key](image)

    def _detect_mixed(self, images) -> Detections:
        """Heterogeneous-size batch: per-shape jitted sub-batches (each
        unique shape = one compiled program, the XLA analogue of TensorRT's
        dynamic input profile). Returns host-side Detections with the batch
        axis in input order."""
        groups: dict = {}
        for i, im in enumerate(images):
            groups.setdefault(tuple(im.shape), []).append(i)
        n = len(images)
        rows: list = [None] * n
        for shape, idxs in groups.items():
            batch = self.detect_batch(np.stack([images[i] for i in idxs]))
            host = jax.device_get(batch)  # one transfer per shape group
            for j, i in enumerate(idxs):
                rows[i] = jax.tree_util.tree_map(lambda x, j=j: x[j], host)
        return Detections(
            xywh=np.stack([r.xywh for r in rows]),
            label=np.stack([r.label for r in rows]),
            confidence=np.stack([r.confidence for r in rows]),
            valid=np.stack([r.valid for r in rows]),
        )

    def detect_batch(self, images: np.ndarray) -> Detections:
        """[B, H, W, 3] same-size batch (multi-camera path)."""
        key = ("batch", images.shape, images.dtype.str)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(jax.vmap(self.detect_fn))
        return self._jitted[key](images)

    def detect_tiled_fn(
        self,
        image: Array,
        max_detections: int | None = None,
        with_stats: bool = False,
        tile: int | None = None,
        overlap: int | None = None,
        border_margin: int | None = None,
        tile_indices: Array | None = None,
    ):
        """Tiled high-resolution detection (traceable): slide a native-res
        ``tile`` x ``tile`` window over the image, run the model on all
        tiles as ONE batch, and merge with a global class-aware NMS.

        Rationale: the reference letterboxes the full 2592x2048 frame to the
        model input (detector.cpp:124-158), which makes a median 62 px robot
        from its own bundled match frames ~15 px at 640 — below the scale
        any detector trained at normal object sizes responds to. Native-res
        tiles keep the object scale inside the training distribution. The
        whole thing is still one fused XLA program: tile extraction is N
        static slices (grid depends only on the static image shape), the
        model runs once at batch N, and the merge NMS reuses
        :func:`ops.detect_ops.nms` over the pooled per-tile survivors.

        Merge semantics: per-tile survivors are restored to tile coordinates,
        detections within ``border_margin`` px of an *interior* tile edge
        are dropped (the neighboring tile sees them whole — guaranteed for
        objects up to ``overlap - 2*margin`` px; larger objects may be
        suppressed everywhere, so size ``overlap`` to the largest expected
        object), shifted to source coordinates, and deduplicated by the same
        strictly-higher-confidence class-aware NMS the per-image path uses
        (equal-confidence cross-tile ties keep both, like the reference's
        kernel, detector.cu:341-357).

        ``with_stats=True`` returns (Detections, n_candidates) where
        n_candidates is the MAX over tiles of above-conf_thresh anchors —
        the per-tile NMS pool is what saturates (each tile runs its own
        top-K pass).

        ``tile_indices`` (optional, [K] int32, K <= n_tiles): run the model
        only on these tiles of the grid — the LiDAR-gated top-K mode (see
        detect/tile_select.py for the selection and its contract). The full
        tile stack is still extracted with static slices (vmap-safe; a
        traced-offset dynamic_slice under the batched camera vmap would
        lower to a generic gather); the gather then keeps K whole tiles,
        and the model batch shrinks from n_tiles to K. Border-suppression
        flags and coordinate shifts are gathered alongside, so merge
        semantics for the selected tiles are identical to the full grid.
        """
        cfg = self.config
        T = tile if tile is not None else (cfg.tile or max(cfg.input_height, cfg.input_width))
        ov = overlap if overlap is not None else cfg.tile_overlap
        margin = (
            border_margin
            if border_margin is not None
            else cfg.tile_border_margin
        )
        m_det = max_detections if max_detections is not None else cfg.max_detections
        src_h, src_w = image.shape[0], image.shape[1]
        if src_h <= T and src_w <= T:
            return self.detect_fn(image, m_det, with_stats)
        ys = _tile_starts(src_h, T, T - ov)
        xs = _tile_starts(src_w, T, T - ov)
        offsets = [(ty, tx) for ty in ys for tx in xs]
        tiles = jnp.stack(
            [
                jax.lax.slice(image, (ty, tx, 0), (ty + T, tx + T, 3))
                for ty, tx in offsets
            ]
        )
        # Interior-border suppression flags in tile coordinates. Static
        # per-tile: an edge is interior unless the tile touches the image
        # edge.
        il = np.array([tx > 0 for _, tx in offsets])
        ir = np.array([tx + T < src_w for _, tx in offsets])
        it = np.array([ty > 0 for ty, _ in offsets])
        ib = np.array([ty + T < src_h for ty, _ in offsets])
        shift_np = np.array(
            [[tx, ty, 0, 0] for ty, tx in offsets], np.float32
        )
        if tile_indices is not None:
            # LiDAR-gated top-K: keep K whole tiles (one gather along the
            # tile axis — contiguous 786 KB rows, DMA-trivial next to the
            # conv FLOPs the shrunk batch saves) and gather the per-tile
            # flag/shift constants to match.
            tiles = jnp.take(tiles, tile_indices, axis=0)
            il = jnp.asarray(il)[tile_indices]
            ir = jnp.asarray(ir)[tile_indices]
            it = jnp.asarray(it)[tile_indices]
            ib = jnp.asarray(ib)[tile_indices]
            shift = jnp.asarray(shift_np)[tile_indices].astype(jnp.float32)
        else:
            shift = jnp.asarray(shift_np)
        per_tile = jax.vmap(
            lambda im: self.detect_fn(im, m_det, with_stats=True)
        )(tiles)
        dets, n_cand = per_tile  # Detections [N, m_det, ...], [N]
        x0 = dets.xywh[..., 0]
        y0 = dets.xywh[..., 1]
        x1 = x0 + dets.xywh[..., 2]
        y1 = y0 + dets.xywh[..., 3]
        cut = (
            (il[:, None] & (x0 <= margin))
            | (ir[:, None] & (x1 >= T - margin))
            | (it[:, None] & (y0 <= margin))
            | (ib[:, None] & (y1 >= T - margin))
        )
        valid = dets.valid & ~cut

        # Shift to source coordinates and pool across tiles.
        pool_xywh = (
            dets.xywh + shift.astype(dets.xywh.dtype)[:, None, :]
        ).reshape(-1, 4)
        pool_label = dets.label.reshape(-1)
        # Invalid slots get confidence -1: strictly below any conf_thresh,
        # so the merge NMS can neither keep nor suppress with them.
        pool_conf = jnp.where(valid, dets.confidence, -1.0).reshape(-1)
        merged = nms(
            pool_xywh,
            pool_label,
            pool_conf,
            cfg.nms_thresh,
            cfg.conf_thresh,
            top_k=pool_xywh.shape[0],
            max_detections=m_det,
        )
        if with_stats:
            return merged, jnp.max(n_cand).astype(jnp.int32)
        return merged

    def detect_tiled(
        self,
        image: np.ndarray,
        tile: int | None = None,
        overlap: int | None = None,
    ) -> Detections:
        """Host convenience wrapper for :meth:`detect_tiled_fn` with a
        per-(shape, grid) jit cache."""
        key = ("tiled", image.shape, image.dtype.str, tile, overlap)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                functools.partial(
                    self.detect_tiled_fn, tile=tile, overlap=overlap
                )
            )
        return self._jitted[key](image)


def _classify_car(
    armors: Detections, class_num: int
) -> Tuple[Array, Array, Array]:
    """Robot::setDetection label/confidence from one car's armor detections.

    label = argmax over classes of summed armor confidence; confidence = that
    sum divided by the number of armors carrying the label
    (reference robot.cpp:41-74). Returns (label, confidence, detected).
    """
    one_hot = (
        armors.label[:, None] == jnp.arange(class_num, dtype=jnp.int32)
    ) & armors.valid[:, None]
    sums = jnp.sum(one_hot * armors.confidence[:, None], axis=0)
    counts = jnp.sum(one_hot, axis=0)
    label = jnp.argmax(sums, axis=-1).astype(jnp.int32)
    count = jnp.maximum(counts[label], 1)
    confidence = sums[label] / count.astype(jnp.float32)
    detected = jnp.any(armors.valid)
    return (
        jnp.where(detected, label, -1),
        jnp.where(detected, confidence, 0.0),
        detected,
    )


def _dedup_same_label(
    rect: Array,
    label: Array,
    confidence: Array,
    detected: Array,
    valid: Array,
    class_num: int,
    iou_thresh: float,
) -> Array:
    """Same-label dedup, replicating RobotDetector::detect's map logic
    (detector.cpp:431-450) ordered over car slots:

    the first detected car of a label holds it; a later same-label car is
    dropped when it overlaps the holder with (bounding-union) IoU >
    iou_thresh, otherwise it replaces the holder iff its confidence is
    higher. Undetected cars always pass through. Returns the keep mask.
    """
    n = rect.shape[0]
    winner = jnp.full((class_num,), -1, jnp.int32)
    for i in range(n):
        is_cand = valid[i] & detected[i]
        l = jnp.clip(label[i], 0, class_num - 1)
        w = winner[l]
        has_winner = w >= 0
        wi = jnp.clip(w, 0, n - 1)
        overlap = union_iou(rect[wi], rect[i]) > iou_thresh
        better = confidence[wi] < confidence[i]
        take = is_cand & (~has_winner | (~overlap & better))
        winner = jnp.where(take, winner.at[l].set(i), winner)
    slots = jnp.arange(n, dtype=jnp.int32)
    is_winner = winner[jnp.clip(label, 0, class_num - 1)] == slots
    return valid & (~detected | is_winner)


def _crop_batch(image: Array, cars: Detections, crop_fn, window: int):
    """Fused crop+letterbox for every car slot, with a windowed fast path.

    The crop resample einsums contract over the source image extents, so on
    a 2048x2592 frame each car pays for the whole image although its crop is
    a few hundred px. When every *valid* car fits a static ``window``-square
    neighborhood, a per-car ``dynamic_slice`` of that neighborhood feeds the
    same resample instead (~6x fewer preprocess FLOPs); one batch-level
    ``lax.cond`` falls back to the full-extent path otherwise, so results are
    bit-identical for any crop size. (The reference's equivalent is the
    host-side ``image(rect).clone()`` per car, detector.cpp:417-424 — its
    crop cost already scaled with the rect, not the frame.)
    """
    src_h, src_w = int(image.shape[0]), int(image.shape[1])

    def full_path(xywh):
        return jax.vmap(lambda b: crop_fn(image, crop_xywh=b))(xywh)

    if not window or (window >= src_h and window >= src_w):
        return full_path(cars.xywh)
    win_h = min(window, src_h)
    win_w = min(window, src_w)

    # Same int truncation + clamping as letterbox_crop's own box handling.
    x0 = jnp.clip(cars.xywh[:, 0].astype(jnp.int32), 0, src_w - 1)
    y0 = jnp.clip(cars.xywh[:, 1].astype(jnp.int32), 0, src_h - 1)
    cw = jnp.clip(cars.xywh[:, 2].astype(jnp.int32), 1, src_w - x0)
    ch = jnp.clip(cars.xywh[:, 3].astype(jnp.int32), 1, src_h - y0)
    fits = jnp.all(jnp.where(cars.valid, (cw <= win_w) & (ch <= win_h), True))

    def windowed_path(xywh):
        # The slice loop is unrolled on purpose: vmap of dynamic_slice with
        # per-car offsets has no batched lowering and becomes a generic
        # gather — the slowest primitive on TPU. Unrolled, each car is a
        # true dynamic_slice (a fast HBM block copy); only the resample
        # below is vmapped.
        windows, shifted = [], []
        for i in range(xywh.shape[0]):
            box = xywh[i]
            bx = jnp.minimum(
                jnp.clip(box[0].astype(jnp.int32), 0, src_w - 1), src_w - win_w
            )
            by = jnp.minimum(
                jnp.clip(box[1].astype(jnp.int32), 0, src_h - 1), src_h - win_h
            )
            windows.append(
                jax.lax.dynamic_slice(
                    image, (by, bx, jnp.int32(0)), (win_h, win_w, 3)
                )
            )
            shift = jnp.stack(
                [bx, by, jnp.int32(0), jnp.int32(0)]
            ).astype(box.dtype)
            shifted.append(box - shift)
        return jax.vmap(lambda w, b: crop_fn(w, crop_xywh=b))(
            jnp.stack(windows), jnp.stack(shifted)
        )

    return jax.lax.cond(fits, windowed_path, full_path, cars.xywh)


def _crop_batch_pallas(
    image: Array, cars: Detections, dst_h: int, dst_w: int, window: int,
    mm_dtype,
):
    """Band-DMA fused crop+letterbox for all car slots via the Pallas
    kernel (ops/pallas_kernels.crop_letterbox_s2d_pallas — PERF.md re-audit
    kernel #1), with the same fits-cond fallback structure as
    :func:`_crop_batch`: crops exceeding the aligned window re-run the
    full-extent XLA path, so results match ``vmap(letterbox_crop_s2d)``
    for any crop size (bit-exact in f32; same ~one-uint8 bound as the XLA
    path in bf16). Single-camera paths only — the cond under vmap would
    execute both branches (callers gate on ``window > 0``)."""
    from ..ops.pallas_kernels import crop_letterbox_s2d_pallas

    blob, pparams, fits = crop_letterbox_s2d_pallas(
        image,
        cars.xywh,
        dst_h,
        dst_w,
        window=window,
        matmul_dtype=mm_dtype,
    )
    ok = jnp.all(jnp.where(cars.valid, fits, True))

    def kernel_path(_):
        return blob, pparams

    def full_path(xywh):
        return jax.vmap(
            lambda b: letterbox_crop_s2d(
                image,
                b,
                dst_height=dst_h,
                dst_width=dst_w,
                matmul_dtype=mm_dtype,
            )
        )(xywh)

    return jax.lax.cond(ok, kernel_path, full_path, cars.xywh)


class RobotDetector:
    """Two-stage cascade: car detection -> per-car armor detection -> robots.

    Equivalent to radar::RobotDetector (detector.cpp:377-455) with fixed
    ``max_cars`` capacity instead of dynamic batching.
    """

    def __init__(
        self,
        config: RobotDetectorConfig | None = None,
        car_variant: str = "m",
        armor_variant: str = "m",
        car_variables: Any = None,
        armor_variables: Any = None,
        dtype: Any = jnp.bfloat16,
    ):
        self.config = config or RobotDetectorConfig()
        self.car = Detector(
            self.config.car_config(), car_variant, car_variables, 0, dtype
        )
        self.armor = Detector(
            self.config.armor_config(), armor_variant, armor_variables, 1, dtype
        )
        self._jitted = {}

    def detect_fn(
        self,
        image: Array,
        max_cars: int | None = None,
        crop_window: int | None = None,
        tile_indices: Array | None = None,
    ) -> RobotBatch:
        """Full fused cascade for one frame (traceable).

        image: uint8 [H, W, 3] BGR. Returns a RobotBatch of capacity
        ``max_cars`` (default config.max_cars) in full-image coordinates.

        ``max_cars`` is the armor-batch *bucket* — the TPU analogue of
        TensorRT's optimization profiles (the reference builds its engine
        with min/opt/max batch 1/4/20, detector.cpp:208-227). Each bucket is
        its own compiled program; the pipeline escalates to a bigger bucket
        (re-running the frame) when a smaller one saturates, so results are
        bucket-independent.

        The car stage always compacts its NMS survivors at the FULL
        ``config.max_cars`` capacity and the armor stage consumes the top
        ``max_cars`` (bucket) of them — bit-identical detections (top-k of a
        longer sorted prefix), but the returned ``n_cars`` is the true
        survivor count, so ``n_cars > bucket`` unambiguously means clipping
        (the reference's dynamic batch always ran the actual count,
        detector.cpp:208-227) while a full-but-exact frame reads
        ``n_cars == bucket``. Costs one slightly-longer top_k (capacity vs
        bucket entries out of the fixed 512-candidate pool).
        """
        cfg = self.config
        if max_cars is None:
            max_cars = cfg.max_cars
        probe_cap = max(cfg.max_cars, max_cars)
        if cfg.car_tile > 0:
            # Config-driven tiled car stage: every pipeline path (run_once,
            # run_stream, the vmapped batch step) inherits high-resolution
            # tiling by constructing RobotDetectorConfig(car_tile=...) —
            # no separate entry point needed. See detect_tiled_fn.
            cars_all, car_candidates = self.car.detect_tiled_fn(
                image,
                max_detections=probe_cap,
                with_stats=True,
                tile_indices=tile_indices,
            )
        else:
            cars_all, car_candidates = self.car.detect_fn(
                image, max_detections=probe_cap, with_stats=True
            )
        return self._cascade_fn(
            image, cars_all, car_candidates, max_cars, crop_window
        )

    def detect_tiled_fn(
        self,
        image: Array,
        max_cars: int | None = None,
        crop_window: int | None = None,
        tile: int | None = None,
        overlap: int | None = None,
        tile_indices: Array | None = None,
    ) -> RobotBatch:
        """Cascade with a TILED car stage (Detector.detect_tiled_fn): the
        high-resolution mode for full-frame radar cameras where robots are
        tens of pixels. The armor stage is unchanged — it already crops each
        car from the original full-resolution image, so its object scale is
        normalized regardless of distance. Still one fused XLA program."""
        cfg = self.config
        if max_cars is None:
            max_cars = cfg.max_cars
        probe_cap = max(cfg.max_cars, max_cars)
        cars_all, car_candidates = self.car.detect_tiled_fn(
            image,
            max_detections=probe_cap,
            with_stats=True,
            tile=tile,
            overlap=overlap,
            tile_indices=tile_indices,
        )
        return self._cascade_fn(
            image, cars_all, car_candidates, max_cars, crop_window
        )

    def _cascade_fn(
        self,
        image: Array,
        cars_all: Detections,
        car_candidates: Array,
        max_cars: int,
        crop_window: int | None,
    ) -> RobotBatch:
        """Armor stage + robot assembly from a car-stage result (shared by
        the whole-image and tiled car paths)."""
        cfg = self.config
        n_cars_true = cars_all.count()
        # Top-`max_cars` by confidence: the NMS compaction is sorted by
        # confidence (ties keep the lower pool index, like a direct
        # max_detections=max_cars run), so this slice IS the bucket's
        # detection set.
        cars = Detections(
            xywh=cars_all.xywh[:max_cars],
            label=cars_all.label[:max_cars],
            confidence=cars_all.confidence[:max_cars],
            valid=cars_all.valid[:max_cars],
        )

        # Fused crop + letterbox for every car slot (invalid slots produce
        # garbage blobs that are masked out of the results). When the armor
        # model has a space-to-depth stem, the crop emits the s2d layout
        # directly — the [640, 640, 3] blob never materializes.
        use_s2d = getattr(self.armor.model, "cfg", None) is not None and getattr(
            self.armor.model.cfg, "s2d_stem", False
        )
        mm_dtype = (
            self.armor.model.dtype
            if self.armor.model.dtype == jnp.bfloat16
            else None
        )
        crop_kind = letterbox_crop_s2d if use_s2d else letterbox_crop
        crop_fn = functools.partial(
            crop_kind,
            dst_height=cfg.armor_input_height,
            dst_width=cfg.armor_input_width,
            matmul_dtype=mm_dtype,
        )
        # crop_window=0 disables the windowed fast path. Batched callers
        # (vmapped multi-camera step) MUST pass 0: under vmap the batch-level
        # lax.cond becomes a select that executes BOTH branches, so the
        # window would add cost instead of saving it.
        eff_window = cfg.crop_window if crop_window is None else crop_window
        if (
            use_s2d
            and eff_window
            and os.environ.get("RM_RADAR_CROP_PALLAS", "0") == "1"
        ):
            # Re-audit kernel #1 (PERF.md): band-DMA fused crop+letterbox.
            # Windowed single-camera paths only (eff_window > 0 rules out
            # the vmapped batch step, whose cond would run both branches).
            blobs, pparams = _crop_batch_pallas(
                image,
                cars,
                cfg.armor_input_height,
                cfg.armor_input_width,
                eff_window,
                mm_dtype,
            )
        else:
            blobs, pparams = _crop_batch(image, cars, crop_fn, eff_window)
        if use_s2d:
            raw = self.armor.model.apply(
                self.armor.variables, blobs, pre_s2d=True
            )
        else:
            raw = self.armor.raw_forward(blobs)  # [max_cars, 4+classes, A]
        acfg = self.armor.config
        armors, armor_candidates = jax.vmap(
            lambda r, p: postprocess(
                r,
                p,
                acfg.nms_thresh,
                acfg.conf_thresh,
                acfg.nms_top_k,
                acfg.max_detections,
                with_candidate_count=True,
            )
        )(raw, pparams)
        # Invalid car slots run the armor model on garbage blobs; their
        # candidate counts are masked out of the saturation telemetry.
        armor_candidates = jnp.max(
            jnp.where(cars.valid, armor_candidates, 0)
        ).astype(jnp.int32)

        # Armor boxes into full-image coordinates: shifted by the *float* car
        # origin, as Robot::setDetection does (robot.cpp:70-73) even though
        # the crop itself used the truncated int origin.
        shift = jnp.concatenate(
            [cars.xywh[:, None, :2], jnp.zeros_like(cars.xywh[:, None, :2])],
            axis=-1,
        )
        armor_xywh = armors.xywh + shift
        armor_valid = armors.valid & cars.valid[:, None]

        label, confidence, detected = jax.vmap(
            lambda a: _classify_car(a, cfg.armor_classes)
        )(armors._replace(valid=armor_valid))

        keep = _dedup_same_label(
            cars.xywh,
            label,
            confidence,
            detected,
            cars.valid,
            cfg.armor_classes,
            cfg.iou_thresh,
        )

        r = max_cars
        return RobotBatch(
            rect=cars.xywh,
            label=jnp.where(keep, label, -1),
            confidence=jnp.where(keep, confidence, 0.0),
            detected=detected & keep,
            valid=keep,
            armor_xywh=armor_xywh,
            armor_label=armors.label,
            armor_conf=armors.confidence,
            armor_valid=armor_valid & keep[:, None],
            location=jnp.full((r, 3), jnp.nan, jnp.float32),
            located=jnp.zeros((r,), bool),
            track_state=jnp.full((r,), int(TrackState.NONE), jnp.int32),
            n_cars=n_cars_true,
            nms_candidates_car=car_candidates.astype(jnp.int32),
            nms_candidates_armor=armor_candidates,
        )

    def detect(self, image: np.ndarray) -> RobotBatch:
        key = (image.shape, image.dtype.str)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self.detect_fn)
        return self._jitted[key](image)

    def detect_tiled(
        self,
        image: np.ndarray,
        tile: int | None = None,
        overlap: int | None = None,
    ) -> RobotBatch:
        key = ("tiled", image.shape, image.dtype.str, tile, overlap)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                functools.partial(
                    self.detect_tiled_fn, tile=tile, overlap=overlap
                )
            )
        return self._jitted[key](image)
