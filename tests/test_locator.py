"""Locator tests with identity calibration and synthetic data, mirroring
reference test/locate/locator_test.cpp: transform round trips, background /
diff behavior, two synthetic blobs -> two clusters, and bbox search.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rm_radar_tpu.configs import LocatorConfig
from rm_radar_tpu.geometry import LidarCalib
from rm_radar_tpu.locate import locator as loc


def _identity_calib(zoom=0.5):
    return LidarCalib.create(np.eye(3), np.eye(4), np.eye(4), zoom)


# Like the reference locator test (locator_test.cpp:15-29), identity
# calibration forces scaled-down units: with K = I a pixel step is ~depth in
# metric units, so thresholds are chosen for depths of ~10-20 units.
CFG = LocatorConfig(
    image_width=128,
    image_height=96,
    zoom_factor=0.5,
    min_depth_diff=0.5,
    max_depth_diff=4.0,
    cluster_tolerance=100.0,
    min_cluster_size=8,
    max_cluster_size=1000,
    max_distance=1e9,
    max_points=512,
    max_foreground=256,
    cc_iterations=8,
)
CAL = _identity_calib()


def _cloud(points):
    out = np.zeros((CFG.max_points, 3), np.float32)
    pts = np.asarray(points, np.float32)
    out[: len(pts)] = pts
    return jnp.asarray(out)


def _point_at_pixel(u, v, depth):
    """Inverse of the identity-calibration projection: a lidar point that
    lands on zoomed pixel (u, v) with the given depth."""
    return [u / CFG.zoom_factor * depth, v / CFG.zoom_factor * depth, depth]


def test_projection_scatter_max():
    # Two points on the same pixel: deterministic max depth wins.
    pts = _cloud(
        [_point_at_pixel(0.02, 0.03, 5.0), _point_at_pixel(0.02, 0.03, 6.0)]
    )
    depth, _ = loc.project_cloud(pts, CAL, CFG)
    # u = 0.02 * 5000 -> pixel (int) truncation
    d = np.asarray(depth)
    assert d.max() == 6.0
    assert np.count_nonzero(d) == 1


def test_zero_points_and_distance_filter():
    pts = _cloud(
        [
            [0.0, 0.0, 0.0],  # dropped: all-zero
            _point_at_pixel(0.01, 0.01, 4.0),
        ]
    )
    # x > max_distance is dropped
    far = np.asarray(pts).copy()
    far[1, 0] = CFG.max_distance + 1
    depth_far, _ = loc.project_cloud(jnp.asarray(far), CAL, CFG)
    assert np.count_nonzero(np.asarray(depth_far)) == 0
    depth, _ = loc.project_cloud(pts, CAL, CFG)
    assert np.count_nonzero(np.asarray(depth)) == 1


def test_update_background_and_diff():
    state = loc.make_state(CFG)
    # Background frame: deep wall at depth 20.
    wall = _cloud([_point_at_pixel(0.1, 0.1, 20.0)])
    state, diff = loc.update(state, wall, CAL, CFG)
    assert np.count_nonzero(np.asarray(diff)) == 0  # no diff vs itself

    # Object appears 2.0 in front of the wall (within the 0.5..4 window).
    obj = _cloud([_point_at_pixel(0.1, 0.1, 18.0)])
    state, diff = loc.update(state, obj, CAL, CFG)
    d = np.asarray(diff)
    assert np.count_nonzero(d) == 1
    assert d.max() == np.float32(18.0)

    # Too-small diff (0.1) is not foreground.
    near_wall = _cloud([_point_at_pixel(0.1, 0.1, 19.9)])
    state, diff = loc.update(state, near_wall, CAL, CFG)
    # Queue still holds the 18.0 frame (newest-wins per pixel: the 19.9
    # frame overwrote the pixel in the newest image but older queued images
    # still qualify).
    d = np.asarray(diff)
    assert d.max() == np.float32(18.0)


def _blob_cloud(cx_px, cy_px, depth, radius_px=2):
    """A dense blob of points around a zoomed pixel center, all at ~depth."""
    pts = []
    for dv in range(-radius_px, radius_px + 1):
        for du in range(-radius_px, radius_px + 1):
            pts.append(_point_at_pixel(cx_px + du, cy_px + dv, depth))
    return pts


def test_cluster_two_blobs():
    state = loc.make_state(CFG)
    # Background: wall at 20.0 across the blobs' pixels.
    bg = _blob_cloud(20, 20, 20.0) + _blob_cloud(40, 30, 20.0)
    state, _ = loc.update(state, _cloud(bg), CAL, CFG)
    # Two foreground blobs well inside the diff window.
    fgpts = _blob_cloud(20, 20, 18.0) + _blob_cloud(40, 30, 18.0)
    state, diff = loc.update(state, _cloud(fgpts), CAL, CFG)
    fg = loc.cluster(diff, CAL, CFG)
    labels = np.asarray(fg.cluster)[np.asarray(fg.valid)]
    roots = np.unique(labels[labels >= 0])
    assert len(roots) == 2


def test_search_finds_blob_centroid():
    state = loc.make_state(CFG)
    bg = _blob_cloud(20, 20, 20.0)
    state, _ = loc.update(state, _cloud(bg), CAL, CFG)
    state, diff = loc.update(state, _cloud(_blob_cloud(20, 20, 18.0)), CAL, CFG)
    fg = loc.cluster(diff, CAL, CFG)
    # Full-image bbox covering the blob: zoomed pixel 20 -> full-image 40.
    rect = jnp.asarray([20.0, 20.0, 40.0, 40.0])
    location, located = loc.search_one(rect, fg, CAL, CFG)
    assert bool(located)
    # Identity calibration: world == lidar; mm -> m scaling applies.
    np.testing.assert_allclose(float(location[2]), 0.018, rtol=1e-3)


def test_search_misses_outside_bbox():
    state = loc.make_state(CFG)
    state, _ = loc.update(state, _cloud(_blob_cloud(20, 20, 20.0)), CAL, CFG)
    state, diff = loc.update(state, _cloud(_blob_cloud(20, 20, 18.0)), CAL, CFG)
    fg = loc.cluster(diff, CAL, CFG)
    rect = jnp.asarray([180.0, 150.0, 40.0, 40.0])  # elsewhere
    _, located = loc.search_one(rect, fg, CAL, CFG)
    assert not bool(located)


def test_cluster_size_gate():
    # A 2-point blob is below min_cluster_size=8 -> demoted to noise (-1),
    # but still usable by search as the unclustered group.
    state = loc.make_state(CFG)
    tiny_bg = [_point_at_pixel(20, 20, 20.0), _point_at_pixel(21, 20, 20.0)]
    state, _ = loc.update(state, _cloud(tiny_bg), CAL, CFG)
    tiny = [_point_at_pixel(20, 20, 18.0), _point_at_pixel(21, 20, 18.0)]
    state, diff = loc.update(state, _cloud(tiny), CAL, CFG)
    fg = loc.cluster(diff, CAL, CFG)
    labels = np.asarray(fg.cluster)[np.asarray(fg.valid)]
    assert np.all(labels == -1)
    rect = jnp.asarray([20.0, 20.0, 40.0, 40.0])
    location, located = loc.search_one(rect, fg, CAL, CFG)
    assert bool(located)
    np.testing.assert_allclose(float(location[2]), 0.018, rtol=1e-3)


def _compaction_cfg(method):
    import dataclasses

    return dataclasses.replace(CFG, candidate_compaction=method)


def test_candidate_compaction_matches_dense():
    """Both point-driven compaction lowerings ("sort": argsort+dedup;
    "scatter": owner-table scatter-min, sort-free) must reproduce the dense
    image-scan lowering exactly: same foreground pixels in scan order, same
    depths, same clusters — across multi-frame sequences with duplicate
    pixels, cross-frame repeats and capacity overflow."""
    import jax

    rng = np.random.default_rng(3)
    for trial, n_pts in enumerate((40, 200, CFG.max_points)):
        clouds = []
        for frame in range(5):
            pts = []
            for _ in range(n_pts):
                u = rng.uniform(0, CFG.zoomed_width - 1)
                v = rng.uniform(0, CFG.zoomed_height - 1)
                # Quantized depths force exact-equality duplicates within
                # and across frames; later frames sit in the diff band of
                # the frame-0 background.
                d = float(rng.integers(8, 16)) if frame == 0 else float(
                    rng.integers(5, 12)
                )
                pts.append(_point_at_pixel(u * 2, v * 2, d))
            clouds.append(_cloud(pts[: CFG.max_points]))

        def replay(cfg):
            state, diff = loc.make_state(cfg), None
            step = jax.jit(lambda s, p: loc.update(s, p, CAL, cfg))
            for cl in clouds:
                state, diff = step(state, cl)
            return state, diff

        state, diff = replay(CFG)
        dense = loc.cluster(diff, CAL, CFG)
        n_fg = int(np.asarray(dense.valid).sum())
        assert trial == 0 or n_fg > 0
        for method in (
            "sort", "scatter", "sort2", "dedup3_sort", "dedup3_topk"
        ):
            cfg_m = _compaction_cfg(method)
            if method.startswith("dedup3"):
                # These methods require queues pruned at enqueue time.
                state_m, diff_m = replay(cfg_m)
                np.testing.assert_array_equal(
                    np.asarray(diff), np.asarray(diff_m)
                )
            else:
                state_m, diff_m = state, diff
            cand = loc.cluster(
                diff_m,
                CAL,
                cfg_m,
                candidates=(state_m.pix_queue, state_m.depth_queue),
            )
            for a, b, name in zip(dense, cand, dense._fields):
                np.testing.assert_array_equal(
                    np.asarray(a),
                    np.asarray(b),
                    err_msg=f"{name} n_pts={n_pts} method={method}",
                )


def test_dedup3_compaction_duplicate_heavy():
    """Stress the dedup3 bound: one pixel receives many equal-depth points
    (per-cloud dedup must collapse them to one candidate) while other
    foreground pixels must still be recovered — without enqueue dedup,
    duplicates of the first pixel would crowd a q*k-sized selection window
    and lose the later pixels."""
    import dataclasses

    import jax

    small = dataclasses.replace(CFG, max_points=128, max_foreground=4)
    # 100 identical points at pixel (5,5), plus 8 distinct pixels after it
    # in scan order; capacity 4 forces truncation at the 4th unique pixel.
    def mk(depth):
        pts = [_point_at_pixel(10, 10, depth)] * 100
        pts += [_point_at_pixel(12 + 2 * i, 10, depth) for i in range(8)]
        cloud = np.zeros((small.max_points, 3), np.float32)
        cloud[: len(pts)] = np.asarray(pts, np.float32)
        return cloud

    for method in ("dedup3_sort", "dedup3_topk"):
        cfg_m = dataclasses.replace(small, candidate_compaction=method)
        state, diff = loc.make_state(cfg_m), None
        step = jax.jit(lambda s, p: loc.update(s, p, CAL, cfg_m))
        state, diff = step(state, mk(20.0))  # background
        state, diff = step(state, mk(18.0))  # foreground band
        dense = loc.cluster(diff, CAL, small)
        cand = loc.cluster(
            diff, CAL, cfg_m,
            candidates=(state.pix_queue, state.depth_queue),
        )
        assert int(np.asarray(dense.valid).sum()) == 4  # truncated at cap
        for a, b, name in zip(dense, cand, dense._fields):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} {method}"
            )


def test_queue_tuple_layout_matches_stacked():
    """queue_layout="tuple" (roll = pytree re-binding, no concatenate) must
    produce bit-identical diffs, states and clusters vs the stacked ring."""
    import dataclasses

    import jax

    rng = np.random.default_rng(9)
    cfg_t = dataclasses.replace(CFG, queue_layout="tuple")
    st_s, st_t = loc.make_state(CFG), loc.make_state(cfg_t)
    step_s = jax.jit(lambda s, p: loc.update(s, p, CAL, CFG))
    step_t = jax.jit(lambda s, p: loc.update(s, p, CAL, cfg_t))
    for frame in range(5):
        pts = [
            _point_at_pixel(
                rng.uniform(0, CFG.zoomed_width - 1) * 2,
                rng.uniform(0, CFG.zoomed_height - 1) * 2,
                float(rng.integers(8, 16) if frame == 0 else
                      rng.integers(5, 12)),
            )
            for _ in range(200)
        ]
        cl = _cloud(pts)
        st_s, diff_s = step_s(st_s, cl)
        st_t, diff_t = step_t(st_t, cl)
        np.testing.assert_array_equal(np.asarray(diff_s), np.asarray(diff_t))
        for i in range(CFG.queue_size):
            np.testing.assert_array_equal(
                np.asarray(st_s.queue[i]), np.asarray(st_t.queue[i])
            )
    np.testing.assert_array_equal(
        np.asarray(st_s.pix_queue), np.asarray(st_t.pix_queue)
    )
    fg_s = loc.cluster(diff_s, CAL, CFG)
    fg_t = loc.cluster(diff_t, CAL, cfg_t)
    for a, b, name in zip(fg_s, fg_t, fg_s._fields):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_candidate_compaction_capacity_exceeds_candidates():
    """max_foreground > queue_size * max_points must pad, not crash (the
    dense path always supported such configs)."""
    import dataclasses

    import jax

    small = dataclasses.replace(CFG, max_points=64, max_foreground=256)
    pts = [_point_at_pixel(u * 2, v * 2, 10.0) for u, v in
           [(5, 5), (6, 5), (7, 5)]]
    cloud = np.zeros((small.max_points, 3), np.float32)
    cloud[: len(pts)] = np.asarray(pts, np.float32)

    def replay(cfg):
        state, diff = loc.make_state(cfg), None
        step = jax.jit(lambda s, p: loc.update(s, p, CAL, cfg))
        for _ in range(4):
            state, diff = step(state, np.asarray(cloud))
        return state, diff

    state, diff = replay(small)
    dense = loc.cluster(diff, CAL, small)
    for method in (
        "sort", "scatter", "sort2", "dedup3_sort", "dedup3_topk"
    ):
        cfg_m = dataclasses.replace(small, candidate_compaction=method)
        state_m, diff_m = (
            replay(cfg_m) if method.startswith("dedup3") else (state, diff)
        )
        cand = loc.cluster(
            diff_m,
            CAL,
            cfg_m,
            candidates=(state_m.pix_queue, state_m.depth_queue),
        )
        for a, b, name in zip(dense, cand, dense._fields):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} {method}"
            )


def test_dedup3_state_config_mismatch_fails_loudly():
    """The dedup3_* selection is exact only over enqueue-pruned queues; a
    state built under one compaction config must be rejected (at trace time,
    via LocatorState's static dedup3 flag) by update/cluster under a
    mismatched config instead of silently truncating foreground (round-3
    advisor finding)."""
    import dataclasses

    import pytest

    cfg_d = dataclasses.replace(CFG, candidate_compaction="dedup3_topk")
    cfg_s = dataclasses.replace(CFG, candidate_compaction="sort")
    state_d = loc.make_state(cfg_d)
    state_s = loc.make_state(cfg_s)
    assert state_d.dedup3 and not state_s.dedup3

    pts = _cloud([_point_at_pixel(0.02, 0.03, 5.0)])
    # Matched configs work.
    state_d2, diff = loc.update(state_d, pts, CAL, cfg_d)
    loc.cluster(diff, CAL, cfg_d, candidates=state_d2)
    # Mismatches raise, jitted or not (the flag is static metadata).
    with pytest.raises(ValueError, match="mismatch"):
        loc.update(state_d, pts, CAL, cfg_s)
    with pytest.raises(ValueError, match="mismatch"):
        loc.cluster(diff, CAL, cfg_s, candidates=state_d2)
    with pytest.raises(ValueError, match="mismatch"):
        jax.jit(
            lambda s, d: loc.cluster(d, CAL, cfg_s, candidates=s)
        )(state_d2, diff)


def test_enqueue_dedup_scatter_matches_sort():
    """The owner-table enqueue dedup produces the same candidate SET per
    cloud (different order) and therefore identical foreground through the
    dedup3_topk selection and cluster()."""
    import dataclasses

    cfg_sort = dataclasses.replace(
        CFG, candidate_compaction="dedup3_topk", enqueue_dedup="sort"
    )
    cfg_scat = dataclasses.replace(
        CFG, candidate_compaction="dedup3_topk", enqueue_dedup="scatter"
    )
    rng = np.random.default_rng(5)

    def cloud():
        pts = [
            _point_at_pixel(
                rng.uniform(0.5, 60), rng.uniform(0.5, 45), rng.uniform(4, 9)
            )
            for _ in range(300)
        ]
        # duplicate-heavy: many points on the same pixels
        pts += pts[:100]
        return _cloud(pts)

    st_a, st_b = loc.make_state(cfg_sort), loc.make_state(cfg_scat)
    for _ in range(4):
        c = cloud()
        st_a, diff_a = loc.update(st_a, c, CAL, cfg_sort)
        st_b, diff_b = loc.update(st_b, c, CAL, cfg_scat)
    np.testing.assert_array_equal(np.asarray(diff_a), np.asarray(diff_b))
    # Same candidate set per queue row (order may differ).
    for q in range(cfg_sort.queue_size):
        a = np.asarray(st_a.pix_queue[q])
        b = np.asarray(st_b.pix_queue[q])
        np.testing.assert_array_equal(np.sort(a), np.sort(b))
    fa = loc.cluster(diff_a, CAL, cfg_sort, candidates=st_a)
    fb = loc.cluster(diff_b, CAL, cfg_scat, candidates=st_b)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_enqueue_dedup_scatter_rejects_pallas_compaction():
    import dataclasses

    import pytest

    cfg = dataclasses.replace(
        CFG, candidate_compaction="dedup3_pallas", enqueue_dedup="scatter"
    )
    state = loc.make_state(cfg)
    pts = _cloud([_point_at_pixel(0.02, 0.03, 5.0)])
    with pytest.raises(ValueError, match="sorted"):
        loc.update(state, pts, CAL, cfg)
