"""Locator: LiDAR point cloud -> per-robot 3D location, fully on device.

Reference pipeline (src/locate/locate.cpp):

* ``update`` projects each point to a zoomed depth image; the background
  image keeps the max-ever depth per pixel; pixels whose current depth sits
  min..max millimeters in front of the background become foreground
  ("diff") pixels (locate.cpp:158-220).
* ``cluster`` back-projects foreground pixels to 3D and runs PCL Euclidean
  clustering (KdTree, tolerance 400 mm, size 8..1000) (locate.cpp:231-264).
* ``search`` picks, within each robot's zoomed bbox, the largest cluster of
  foreground points and returns its centroid in world coordinates
  (locate.cpp:276-311).

TPU-native redesign:

* The racy per-point image writes (a benign data race in the reference,
  locate.cpp:188-192) become deterministic ``scatter-max`` — same result,
  race-free by construction.
* The depth-image queue is a fixed [Q, H, W] ring; the diff image is a
  masked reduction over it (newest frame wins where several qualify, making
  the reference's parallel-overwrite race deterministic).
* PCL's KdTree clustering becomes connected components on the foreground
  point radius graph, computed by min-label propagation with pointer
  jumping — O(N^2) dense masked ops over a fixed N=max_foreground capacity,
  which the VPU eats for breakfast at N<=4096. Size limits (8..1000) are
  enforced with a segment count, exactly like EuclideanClusterExtraction.
* ``search`` is a vmap over robot slots of masked bincount/segment means —
  no host loops.

State (background, queue) lives in a LocatorState pytree that flows through
jit; the Locator class is a thin host wrapper holding the latest state.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Calibration, LocatorConfig
from ..geometry import (
    LidarCalib,
    camera_to_lidar,
    lidar_to_camera_uvd,
    lidar_to_world,
    zoom_rect,
)
from ..types import Array, RobotBatch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LocatorState:
    """Device-resident locator state.

    Besides the reference's depth-image ring (locate.cpp:200-219), the state
    carries the projected (pixel, depth) list of each queued cloud. Every
    nonzero diff pixel's value is, by construction, the scatter-max winner of
    some queued cloud at that pixel — so the foreground pixels can be
    recovered by checking ~Q*max_points candidate points against the diff
    image instead of scanning its 1.3M pixels (a 27x smaller sort domain;
    see :func:`_compact_from_candidates`).

    A registered dataclass (not a NamedTuple) so the static ``dedup3``
    field can travel with the state as pytree *metadata*: the dedup3_*
    compaction lowerings are exact only over queues pruned at enqueue time,
    and recording that fact statically lets :func:`update` and
    :func:`cluster` reject a config mismatch at trace time instead of
    silently truncating foreground (round-3 advisor finding).
    """

    background: Array  # [H, W] float32, max-ever depth (mm)
    # [Q, H, W] float32 ring of recent depth images — or, with
    # config.queue_layout == "tuple", a tuple of Q [H, W] leaves whose
    # per-frame roll is pure pytree re-binding (no 16 MB concatenate; the
    # pass-through leaves alias donated inputs).
    queue: Array
    frames_seen: Array  # int32 scalar
    pix_queue: Array  # [Q, P] int32 flat pixel per queued point (H*W pad)
    depth_queue: Array  # [Q, P] float32 projected depth per queued point
    # STATIC: queues were pruned to <= 1 candidate per pixel per cloud at
    # enqueue time (config.candidate_compaction startswith "dedup3").
    dedup3: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


class Foreground(NamedTuple):
    """Clustered foreground points (fixed capacity N = max_foreground)."""

    uv: Array  # [N, 2] int32 pixel coords in the zoomed image
    points: Array  # [N, 3] float32 LiDAR-frame mm
    cluster: Array  # [N] int32 cluster root index, -1 = unclustered noise
    valid: Array  # [N] bool
    diff: Array  # [H, W] float32 diff depth image (for tests/debug)


def make_state(config: LocatorConfig) -> LocatorState:
    h, w = config.zoomed_height, config.zoomed_width
    if config.queue_layout == "tuple":
        queue = tuple(
            jnp.zeros((h, w), jnp.float32) for _ in range(config.queue_size)
        )
    else:
        queue = jnp.zeros((config.queue_size, h, w), jnp.float32)
    return LocatorState(
        background=jnp.zeros((h, w), jnp.float32),
        queue=queue,
        frames_seen=jnp.zeros((), jnp.int32),
        pix_queue=jnp.full(
            (config.queue_size, config.max_points), h * w, jnp.int32
        ),
        depth_queue=jnp.zeros(
            (config.queue_size, config.max_points), jnp.float32
        ),
        dedup3=config.candidate_compaction.startswith("dedup3"),
    )


def project_cloud(
    points: Array, calib: LidarCalib, config: LocatorConfig
) -> Tuple[Array, Array]:
    """Point cloud [N, 3] (mm, zero-padded) -> (depth image [H, W], point
    validity mask).

    Point filters mirror locate.cpp:173-193: drop exact zeros, drop
    x > max_distance, drop projections outside the zoomed image (we use a
    half-open bound u < W, v < H where the reference's inclusive bound writes
    one pixel out of row bounds — consciously fixed). Depth conflicts on one
    pixel resolve to the max (deterministic replacement for the reference's
    last-writer-wins race).
    """
    flat_idx, d, ok = _project_flat(points, calib, config)
    h, w = config.zoomed_height, config.zoomed_width
    depth = jnp.zeros((h * w + 1,), jnp.float32)
    depth = depth.at[flat_idx].max(d)
    return depth[:-1].reshape(h, w), ok


def _project_flat(
    points: Array, calib: LidarCalib, config: LocatorConfig
) -> Tuple[Array, Array, Array]:
    """Per-point (flat pixel index, depth, validity); invalid points get the
    H*W sentinel pixel and depth 0."""
    h, w = config.zoomed_height, config.zoomed_width
    nonzero = jnp.any(points != 0.0, axis=-1)
    near = points[:, 0] <= config.max_distance
    uvd = lidar_to_camera_uvd(points, calib)
    u = uvd[:, 0].astype(jnp.int32)
    v = uvd[:, 1].astype(jnp.int32)
    d = uvd[:, 2]
    in_img = (uvd[:, 0] >= 0) & (u < w) & (uvd[:, 1] >= 0) & (v < h)
    ok = nonzero & near & in_img
    flat_idx = jnp.where(ok, v * w + u, h * w)  # sentinel bucket for invalid
    return flat_idx, jnp.where(ok, d, 0.0), ok


def _dedup_cloud_candidates_scatter(
    pix: Array, d: Array, depth_flat: Array, hw: int
) -> Tuple[Array, Array]:
    """Owner-table lowering of :func:`_dedup_cloud_candidates`: scatter-min
    each max-depth candidate's index into a [H*W+1] table and keep owners —
    no argsort (the enqueue stage's dominant op, ~10K keys/cloud). Keeps
    the same candidate SET (<= 1 max-depth candidate per pixel; which
    duplicate survives is value-irrelevant — all carry the scatter-max
    depth) but in ORIGINAL projection order, not pixel-sorted — compatible
    with the dedup3_topk/dedup3_sort selections (they only need the
    <=1-per-pixel-per-cloud bound) but NOT with dedup3_pallas (whose
    per-row quota proof needs sorted rows; update() enforces the pairing).
    The round-3 A/B measured a 49K-update scatter slower than its argsort;
    at the enqueue granularity the domain is max_points (~10K), where the
    scatter is expected to win — measured via RM_RADAR_ENQUEUE_DEDUP.
    """
    m = pix.shape[0]
    is_max = (pix < hw) & (d == depth_flat[jnp.minimum(pix, hw)])
    key = jnp.where(is_max, pix, hw)
    j = jnp.arange(m, dtype=jnp.int32)
    owner = jnp.full((hw + 1,), m, jnp.int32).at[key].min(j)
    keep = is_max & (owner[key] == j)
    return (
        jnp.where(keep, pix, hw).astype(jnp.int32),
        jnp.where(keep, d, 0.0),
    )


def _dedup_cloud_candidates(
    pix: Array, d: Array, depth_flat: Array, hw: int
) -> Tuple[Array, Array]:
    """Prune one cloud's (pixel, depth) candidates to <= 1 per pixel.

    Only a max-depth candidate can ever match its own cloud's depth image
    (built by scatter-max), and duplicate matches carry equal values, so
    keeping a single max-depth candidate per pixel preserves the exact
    foreground recovery of :func:`_compact_from_candidates` while bounding
    duplicates per pixel across the whole queue to queue_size — the bound
    the "dedup3_*" compaction methods rely on. Output is in pixel-sorted
    order (candidate order within a cloud is value-irrelevant downstream).
    """
    is_max = (pix < hw) & (d == depth_flat[jnp.minimum(pix, hw)])
    # Max-depth candidates sort before others within a pixel, so the first
    # entry of each pixel run is a max-depth one whenever the pixel has any
    # valid candidate (the scatter-max is attained by one of them).
    key = pix * 2 + jnp.where(is_max, 0, 1)
    order = jnp.argsort(key)
    spix = pix[order]
    sd = d[order]
    first = jnp.concatenate([jnp.ones((1,), bool), spix[1:] != spix[:-1]])
    keep = first & (spix < hw)
    return (
        jnp.where(keep, spix, hw).astype(jnp.int32),
        jnp.where(keep, sd, 0.0),
    )


def update(
    state: LocatorState,
    points: Array,
    calib: LidarCalib,
    config: LocatorConfig,
) -> Tuple[LocatorState, Array]:
    """Locator::update: ingest one cloud, return (new state, diff image).

    diff[px] = depth if min_depth_diff <= background - depth <= max_depth_diff
    for any queued depth image, newest image winning conflicts
    (locate.cpp:200-219 resolves them by thread race; we fix newest-wins).
    """
    dedup3 = config.candidate_compaction.startswith("dedup3")
    if state.dedup3 != dedup3:
        raise ValueError(
            "LocatorState/LocatorConfig mismatch: the state's queues were "
            f"built with dedup3={state.dedup3} but "
            f"candidate_compaction={config.candidate_compaction!r} implies "
            f"dedup3={dedup3}. The dedup3_* compaction lowerings are exact "
            "only over enqueue-pruned queues — rebuild the state with "
            "make_state(config) for this config."
        )
    flat_idx, d, _ = _project_flat(points, calib, config)
    h, w = config.zoomed_height, config.zoomed_width
    depth = jnp.zeros((h * w + 1,), jnp.float32)
    depth = depth.at[flat_idx].max(d)
    if dedup3:
        if config.enqueue_dedup == "scatter":
            if config.candidate_compaction == "dedup3_pallas":
                raise ValueError(
                    "enqueue_dedup='scatter' emits unsorted rows; "
                    "dedup3_pallas requires pixel-sorted rows (its per-row "
                    "quota exactness proof). Use enqueue_dedup='sort'."
                )
            flat_idx, d = _dedup_cloud_candidates_scatter(
                flat_idx, d, depth, h * w
            )
        else:
            flat_idx, d = _dedup_cloud_candidates(flat_idx, d, depth, h * w)
    depth = depth[:-1].reshape(h, w)
    background = jnp.maximum(state.background, depth)
    if config.queue_layout == "tuple":
        # Pure pytree re-binding: the surviving images are pass-through
        # leaves (aliased under donation), only the new image is fresh.
        queue = tuple(state.queue[1:]) + (depth,)
    else:
        queue = jnp.concatenate([state.queue[1:], depth[None]], axis=0)
    pix_queue = jnp.concatenate([state.pix_queue[1:], flat_idx[None]], axis=0)
    depth_queue = jnp.concatenate([state.depth_queue[1:], d[None]], axis=0)

    diff = jnp.zeros_like(depth)
    for i in range(config.queue_size):  # static, oldest -> newest
        img = queue[i]
        delta = background - img
        mask = (
            (img != 0.0)
            & (delta >= config.min_depth_diff)
            & (delta <= config.max_depth_diff)
        )
        diff = jnp.where(mask, img, diff)
    new_state = LocatorState(
        background=background,
        queue=queue,
        frames_seen=state.frames_seen + 1,
        pix_queue=pix_queue,
        depth_queue=depth_queue,
        dedup3=dedup3,
    )
    return new_state, diff


def diff_from_state(state: LocatorState, config: LocatorConfig) -> Array:
    """Recompute the diff image :func:`update` returned when ``state`` was
    produced — the same newest-wins loop over the state's queue against its
    background (both already post-ingest). Used by consumers that need the
    frame's foreground after the fact (tiled top-K telemetry in bench.py,
    repair-path tile re-selection) without re-running the projection."""
    diff = jnp.zeros_like(state.background)
    for i in range(config.queue_size):  # static, oldest -> newest
        img = state.queue[i]
        delta = state.background - img
        mask = (
            (img != 0.0)
            & (delta >= config.min_depth_diff)
            & (delta <= config.max_depth_diff)
        )
        diff = jnp.where(mask, img, diff)
    return diff


def _connected_components(
    points: Array, valid: Array, tolerance: float, iterations: int
) -> Array:
    """Connected components of the radius graph over [N, 3] points.

    Equivalent to PCL EuclideanClusterExtraction connectivity (locate.cpp:
    255-257): two points join a cluster when within ``tolerance`` (mm).
    Min-label propagation with pointer jumping: labels are point indices;
    each round takes the min label over the point's neighborhood, then
    compresses label chains (label = label[label], twice), giving
    convergence in O(log diameter) rounds.
    """
    n = points.shape[0]
    # Pairwise squared distances on the MXU: |a|^2 + |b|^2 - 2 a.b^T.
    # (The naive broadcast difference materializes an [N, N, 3] tensor —
    # ~200 MB of HBM traffic at N=4096 — and was the locate stage's
    # dominant cost.) Points span ~3e4 mm so the f32 cross term keeps
    # millimeter-scale accuracy vs. the 400 mm tolerance.
    sq = jnp.sum(points * points, axis=-1)
    cross = jnp.matmul(
        points, points.T, precision=jax.lax.Precision.HIGHEST
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * cross
    adj = (d2 <= tolerance * tolerance) & valid[:, None] & valid[None, :]
    big = jnp.int32(n)
    labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), big)

    def body(_, labels):
        neigh = jnp.where(adj, labels[None, :], big)
        labels = jnp.minimum(labels, jnp.min(neigh, axis=-1))
        safe = jnp.clip(labels, 0, n - 1)
        labels = jnp.where(valid, labels[safe], labels)
        safe = jnp.clip(labels, 0, n - 1)
        labels = jnp.where(valid, labels[safe], labels)
        return labels

    labels = jax.lax.fori_loop(0, iterations, body, labels0)
    return jnp.where(valid, labels, -1)


def _compact_from_candidates(
    diff: Array,
    pix_queue: Array,
    depth_queue: Array,
    n_out: int,
    method: str = "sort",
) -> Tuple[Array, Array]:
    """First ``n_out`` nonzero diff pixels in scan order, recovered from the
    queued point projections instead of scanning the image.

    Every nonzero diff pixel holds the scatter-max depth of some queued
    cloud at that pixel (update() copies queue values through), and that max
    is attained by an actual point of that cloud — so gathering diff at the
    ~Q*P candidate pixels and keeping exact matches recovers precisely
    {(pixel, diff[pixel]) : diff[pixel] != 0}. This replaced the 1.3M-pixel
    top_k (the previous 2.6 ms dominant non-conv op); equivalence is tested
    against the dense lowering. Returns (flat_idx [n_out] int32 with -1
    padding, value [n_out] f32).

    ``method`` picks the duplicate-pixel removal lowering (duplicates arise
    when several queued clouds/points carry the winning value; all carry the
    SAME depth, so which one survives is value-irrelevant — both lowerings
    keep the lowest candidate index, making them exactly equal):

    * "sort": argsort the ~49K candidate keys, keep first of each equal run
      (the round-2 lowering; full sort dominates the cluster stage at
      ~1.4 ms/frame in the round-3 stage ablation).
    * "scatter": scatter-min each candidate's index into a [H*W+1] owner
      table and keep candidates that own their pixel — no sort; the only
      remaining O(M log) op is the final top_k. (Measured +0.22 ms/frame
      vs "sort" at M=49K: a 49K-update scatter costs more than the argsort
      it replaces.)
    * "sort2": argsort + dedup like "sort", but the selection of the first
      n_out kept entries is a cumsum rank + scatter into the small output
      table instead of a second top_k pass over M keys. (Measured
      +0.295 ms/frame vs "sort" in the round-3 batch-8 interleaved A/B:
      the cumsum + two M-update scatters cost more than the top_k they
      replace. Both top_k-replacement attempts lost — the argsort itself
      is the irreducible part of this op on TPU.)
    * "dedup3_sort" / "dedup3_topk": REQUIRE queues pruned at enqueue time
      (update() applies :func:`_dedup_cloud_candidates` when the config's
      candidate_compaction starts with "dedup3"). With <= 1 candidate per
      pixel per cloud, duplicates per pixel are bounded by Q = queue_size,
      so the first n_out unique keys all lie within the first Q*n_out
      sorted positions — the selection pass shrinks from the full M domain
      to a static Q*n_out slice. "dedup3_sort" keeps the argsort and
      replaces the M-wide top_k with a sliced one (measured a wash:
      -0.023 ms/frame vs "sort"); "dedup3_topk" drops the argsort
      entirely and uses top_k(M -> Q*n_out) + top_k(Q*n_out -> n_out) —
      measured -0.328 ms/frame vs "sort" in the round-3 interleaved
      batch-8 A/B at the shipped config, making it the default.
    """
    if method == "dedup3_pallas":
        # Pallas pre-compactor (PERF.md re-audit kernel #2): per-row
        # scan-and-append replaces the M-wide first top_k; exactly equals
        # "dedup3_topk" (tested) and requires the same enqueue pruning.
        from ..ops.pallas_kernels import compact_candidates_pallas

        return compact_candidates_pallas(diff, pix_queue, depth_queue, n_out)
    hw = diff.size
    q = pix_queue.shape[0]
    flat = diff.reshape(-1)
    pix = pix_queue.reshape(-1)
    depth = depth_queue.reshape(-1)
    safe = jnp.minimum(pix, hw - 1)
    is_fg = (pix < hw) & (depth != 0.0) & (flat[safe] == depth)
    key = jnp.where(is_fg, pix, hw)
    m = key.shape[0]
    # Configs may ask for more foreground slots than there are candidates
    # (max_foreground > queue_size * max_points): top_k caps at the
    # candidate count and the output pads with invalid slots.
    k = min(n_out, m)
    if method == "dedup3_topk":
        t = min(q * k, m)
        neg_t, pos_t = jax.lax.top_k(-key, t)
        skey = -neg_t  # t smallest keys, ascending, <= q dups per pixel
        first = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
        )
        keep = first & (skey < hw)
        key2 = jnp.where(keep, skey, hw)
        neg, pos = jax.lax.top_k(-key2, k)
        vals = depth[pos_t[pos]]
    elif method == "scatter":
        j = jnp.arange(m, dtype=jnp.int32)
        owner = jnp.full((hw + 1,), m, jnp.int32).at[key].min(j)
        uniq = owner[key] == j
        key2 = jnp.where(uniq & is_fg, key, hw)
        neg, pos = jax.lax.top_k(-key2, k)
        vals = depth[pos]
    elif method == "sort2":
        order = jnp.argsort(key)
        skey = key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
        )
        keep = first & (skey < hw)
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slot = jnp.where(keep & (rank < k), rank, k)
        out_idx = jnp.full((k + 1,), hw, jnp.int32).at[slot].set(
            skey, mode="drop"
        )
        out_val = jnp.zeros((k + 1,), jnp.float32).at[slot].set(
            depth[order], mode="drop"
        )
        idx0 = out_idx[:k]
        valid = idx0 < hw
        pad = n_out - k
        idx = jnp.pad(
            jnp.where(valid, idx0, -1), (0, pad), constant_values=-1
        )
        val = jnp.pad(jnp.where(valid, out_val[:k], 0.0), (0, pad))
        return idx, val
    elif method == "dedup3_sort":
        order = jnp.argsort(key)
        skey = key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
        )
        keep = first & (skey < hw)
        # Enqueue dedup bounds dups per pixel to q, so the first k kept
        # entries sit within the first q*k sorted positions: the selection
        # top_k runs over a static slice instead of the full M domain.
        t = min(q * k, m)
        key2 = jnp.where(keep, skey, hw)[:t]
        neg, pos = jax.lax.top_k(-key2, k)
        vals = depth[order[:t][pos]]
    else:
        # Scan order + dedup by stable sort: first of each equal key run.
        order = jnp.argsort(key)
        skey = key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
        )
        keep = first & (skey < hw)
        key2 = jnp.where(keep, skey, hw)
        neg, pos = jax.lax.top_k(-key2, k)
        vals = depth[order][pos]
    idx = -neg
    valid = idx < hw
    pad = n_out - k
    idx = jnp.pad(jnp.where(valid, idx, -1).astype(jnp.int32), (0, pad),
                  constant_values=-1)
    val = jnp.pad(jnp.where(valid, vals, 0.0), (0, pad))
    return idx, val


def cluster(
    diff: Array,
    calib: LidarCalib,
    config: LocatorConfig,
    candidates: Optional[
        Union["LocatorState", Tuple[Array, Array]]
    ] = None,
) -> Foreground:
    """Locator::cluster: foreground pixels -> 3D points -> clusters.

    Clusters outside [min_cluster_size, max_cluster_size] are demoted to
    noise (cluster id -1), matching PCL's size gate; noise points still
    participate in search as the reference's "unclustered" candidate group
    (locate.cpp:292-295).

    ``candidates``: the LocatorState (preferred — its static ``dedup3``
    flag is checked against this config at trace time, so an update/cluster
    config mismatch fails loudly instead of truncating foreground), or a
    bare (pix_queue, depth_queue) tuple (legacy; the caller vouches for the
    config pairing). Either enables the point-driven compaction (sorts ~49K
    candidate points instead of 1.3M pixels; identical result, tested).
    Without it the dense top_k lowering scans the image.
    """
    if isinstance(candidates, LocatorState):
        want = config.candidate_compaction.startswith("dedup3")
        if candidates.dedup3 != want:
            raise ValueError(
                "LocatorState/LocatorConfig mismatch: state queues built "
                f"with dedup3={candidates.dedup3} but candidate_compaction="
                f"{config.candidate_compaction!r} implies dedup3={want}; "
                "the dedup3_* selection would silently drop foreground "
                "pixels over un-pruned queues. Pair cluster() with the "
                "config that built the state."
            )
        candidates = (candidates.pix_queue, candidates.depth_queue)
    h, w = diff.shape
    n = config.max_foreground
    # First-n foreground pixels in scan order. Lowerings, fastest first:
    # point-driven candidate compaction (needs the state's projection
    # queues), top_k over negated indices (~2.8 ms at 1.3M px), Pallas
    # sparse-scan kernel (ops/pallas_kernels.py), jnp.nonzero (full-image
    # scatter, ~13 ms).
    from ..ops.pallas_kernels import foreground_compact

    if candidates is not None:
        idx, d = _compact_from_candidates(
            diff, *candidates, n_out=n, method=config.candidate_compaction
        )
    else:
        idx, d = foreground_compact(
            diff, n, use_pallas=config.use_pallas_compaction
        )
    valid = idx >= 0
    idx = jnp.where(valid, idx, h * w)
    safe = jnp.minimum(idx, h * w - 1)
    v = (safe // w).astype(jnp.float32)
    u = (safe % w).astype(jnp.float32)
    uvd = jnp.stack([u, v, d], axis=-1)
    points = camera_to_lidar(uvd, calib)

    labels = _connected_components(
        points, valid, config.cluster_tolerance, config.cc_iterations
    )
    # Cluster size gate (segment count over root labels).
    counts = jnp.zeros((n + 1,), jnp.int32)
    counts = counts.at[jnp.where(valid, labels, n)].add(1)
    size_ok = (counts >= config.min_cluster_size) & (
        counts <= config.max_cluster_size
    )
    labels = jnp.where(valid & size_ok[jnp.clip(labels, 0, n)], labels, -1)

    return Foreground(
        uv=jnp.stack([safe % w, safe // w], axis=-1).astype(jnp.int32),
        points=points,
        cluster=labels,
        valid=valid,
        diff=diff,
    )


def search_one(
    rect_xywh: Array, fg: Foreground, calib: LidarCalib, config: LocatorConfig
) -> Tuple[Array, Array]:
    """Locator::search for one robot bbox (full-image pixels).

    Foreground points inside the zoomed bbox are grouped by cluster id
    (noise id -1 forms its own group); the largest group's centroid maps to
    world coordinates. Returns (location_m [3], located bool) — location is
    converted mm -> m as Robot::setLocation does (robot.h:93-95).
    """
    n = fg.points.shape[0]
    r = zoom_rect(
        rect_xywh,
        config.zoom_factor,
        config.zoomed_width,
        config.zoomed_height,
    )
    x0, y0, rw, rh = r[0], r[1], r[2], r[3]
    u, v = fg.uv[:, 0], fg.uv[:, 1]
    inside = (
        fg.valid
        & (u >= x0)
        & (u < x0 + rw)
        & (v >= y0)
        & (v < y0 + rh)
    )
    # Group key: cluster root + 1, with noise (-1) in bucket 0 so that count
    # ties resolve to the lowest cluster id with noise first — the iteration
    # order of the reference's std::map<int, ...> (locate.cpp:281-306).
    key = jnp.where(inside, fg.cluster + 1, n + 1)
    counts = jnp.zeros((n + 2,), jnp.int32).at[key].add(1)
    counts = counts.at[n + 1].set(0)
    best = jnp.argmax(counts)
    best_count = counts[best]
    members = inside & (key == best)
    centroid = jnp.sum(
        jnp.where(members[:, None], fg.points, 0.0), axis=0
    ) / jnp.maximum(best_count, 1).astype(jnp.float32)
    world_mm = lidar_to_world(centroid, calib)
    located = best_count > 0
    return jnp.where(located, world_mm * 1e-3, jnp.nan), located


def search(
    robots: RobotBatch, fg: Foreground, calib: LidarCalib, config: LocatorConfig
) -> RobotBatch:
    """Vectorized Locator::search over all robot slots (locate.cpp:323-326)."""
    locs, located = jax.vmap(
        lambda rect: search_one(rect, fg, calib, config)
    )(robots.rect)
    located = located & robots.valid
    return robots._replace(
        location=jnp.where(located[:, None], locs, robots.location),
        located=located,
    )


class Locator:
    """Host wrapper mirroring the reference Locator API
    (update / cluster / search), holding device state between frames."""

    def __init__(
        self,
        config: LocatorConfig | None = None,
        calibration: Calibration | None = None,
    ):
        self.config = config or LocatorConfig()
        calibration = calibration or Calibration()
        self.calib = LidarCalib.create(
            calibration.intrinsic_np(),
            calibration.lidar_to_camera_np(),
            calibration.world_to_camera_np(),
            self.config.zoom_factor,
        )
        self.state = make_state(self.config)
        self._diff: Optional[Array] = None
        self._fg: Optional[Foreground] = None
        self._update = jax.jit(
            functools.partial(update, calib=self.calib, config=self.config)
        )
        self._cluster = jax.jit(
            functools.partial(cluster, calib=self.calib, config=self.config)
        )
        self._search = jax.jit(
            functools.partial(search, calib=self.calib, config=self.config)
        )

    def update(self, points: np.ndarray) -> None:
        """Ingest one cloud ([N, 3] mm; will be padded to capacity)."""
        from ..utils.io import pad_points

        if points is None or len(points) == 0:
            return
        padded = pad_points(points, self.config.max_points)
        self.state, self._diff = self._update(self.state, padded)

    def cluster(self) -> None:
        if self._diff is None:
            return
        self._fg = self._cluster(self._diff, candidates=self.state)

    def search(self, robots: RobotBatch) -> RobotBatch:
        if self._fg is None:
            return robots
        return self._search(robots, self._fg)
