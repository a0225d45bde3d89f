"""LiDAR-gated top-K tile selection (detect/tile_select.py + the
``car_tile_topk`` pipeline mode).

The tiled car stage runs a 48-tile grid on a 2592x2048 frame; on the
radar's workload almost all tiles are empty floor the LiDAR already knows
is empty. These tests pin (1) the selector's scoring/coverage guarantees,
(2) that the gather path through Detector.detect_tiled_fn is exactly the
full grid when every tile is selected, and (3) the end-to-end Radar
equivalence: with the foreground covering every car, the gated pipeline
produces the full grid's robots.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from rm_radar_tpu.configs import (
    Calibration,
    DetectorConfig,
    LocatorConfig,
    RadarConfig,
    RobotDetectorConfig,
    TrackerConfig,
)
from rm_radar_tpu.detect.detector import Detector, _tile_starts
from rm_radar_tpu.detect.tile_select import TileSelector
from rm_radar_tpu.models.weights import load_variables
from rm_radar_tpu.pipeline import Radar
from rm_radar_tpu.train import synth
from rm_radar_tpu.types import Frame

from test_tiled import _iou, _paste_scene_on_canvas  # noqa: E402

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _selector(src_h=1024, src_w=1280, tile=640, overlap=192, zoom=0.5):
    return TileSelector(src_h, src_w, tile, overlap, margin=8, zoom=zoom)


def test_selector_grid_matches_tile_starts():
    s = _selector()
    ys = _tile_starts(1024, 640, 448)
    xs = _tile_starts(1280, 640, 448)
    assert s.offsets == [(ty, tx) for ty in ys for tx in xs]
    assert s.n_tiles == len(ys) * len(xs)


def test_selector_scores_and_coverage():
    s = _selector()  # zoomed frame 512x640, block 16
    diff = np.zeros((512, 640), np.float32)
    # Blob wholly inside tile (ty=0, tx=0)'s interior (zoomed coords of
    # full-res (100..200, 100..200) = (50..100, 50..100)).
    diff[50:100, 50:100] = 1000.0
    idx, unc = jax.jit(lambda d: s.select(d, 1))(jnp.asarray(diff))
    assert int(idx[0]) == s.offsets.index((0, 0))
    assert int(unc) == 0
    # A second blob far away (inside tile (384, 640)) goes uncovered at K=1
    # because the first blob is bigger (more occupied blocks).
    diff2 = diff.copy()
    diff2[450:470, 500:520] = 1000.0
    idx, unc = jax.jit(lambda d: s.select(d, 1))(jnp.asarray(diff2))
    assert int(idx[0]) == s.offsets.index((0, 0))
    assert int(unc) > 0
    # K=2 covers both.
    idx, unc = jax.jit(lambda d: s.select(d, 2))(jnp.asarray(diff2))
    assert int(unc) == 0


def test_selector_small_blob_near_interior_edge_still_scores():
    """Outer block rounding: a blob hugging the interior-margin boundary of
    its whole-tile must not round its own tile's score to zero."""
    s = _selector()
    # Tile (0, 448): interior x in [456, 1080] full-res; place a tiny blob
    # right at x ~ 458 (zoomed 229 -> block 14, partially outside the
    # interior's exact zoomed start 228).
    diff = np.zeros((512, 640), np.float32)
    diff[100:104, 229:233] = 1000.0
    scores = jax.jit(s.scores)(jnp.asarray(diff))
    n = s.offsets.index((0, 448))
    assert float(scores[n]) >= 1.0


def test_selector_empty_diff_selects_deterministically():
    s = _selector()
    idx, unc = jax.jit(lambda d: s.select(d, 3))(
        jnp.zeros((512, 640), jnp.float32)
    )
    assert int(unc) == 0
    assert sorted(int(i) for i in idx) == [0, 1, 2]  # stable tie order


def _fake_fg(uv, cluster, zh=512, zw=640):
    """Minimal locate Foreground for selector tests: diff lit at each
    point's pixel, all points valid."""
    from rm_radar_tpu.locate.locator import Foreground

    uv = np.asarray(uv, np.int32)
    diff = np.zeros((zh, zw), np.float32)
    diff[uv[:, 1], uv[:, 0]] = 1000.0
    return Foreground(
        uv=jnp.asarray(uv),
        points=jnp.zeros((len(uv), 3), jnp.float32),
        cluster=jnp.asarray(np.asarray(cluster, np.int32)),
        valid=jnp.ones((len(uv),), bool),
        diff=jnp.asarray(diff),
    )


def test_select_clusters_guarantees_small_cluster_tile():
    """A fat cluster lighting two tiles' interiors must not evict a small
    distant cluster under the cluster-aware selection (it does under pure
    block-score top-K — the failure the first TPU A/B measured)."""
    s = _selector()
    # Fat cluster: a dense blob spanning the seam region x ~ 420-520 px
    # full-res (zoomed 210-260) — interior to both (0, 0) and (0, 448).
    fat = [
        (x, y) for x in range(210, 260, 2) for y in range(100, 150, 2)
    ]
    # Small cluster: 3x3 points deep inside tile (384, 640).
    small = [(x, y) for x in range(550, 556, 2) for y in range(450, 456, 2)]
    uv = fat + small
    cluster = [0] * len(fat) + [len(fat)] * len(small)
    fg = _fake_fg(uv, cluster)
    block_idx, _ = jax.jit(lambda d: s.select(d, 2))(fg.diff)
    aware_idx, unc, guar = jax.jit(lambda f: s.select_clusters(f, 2))(fg)
    aware = {int(i) for i in aware_idx}
    assert int(guar) == 2
    assert s.offsets.index((384, 640)) in aware
    # and the pure block-score selection indeed lacks the small tile
    # (the fat cluster's two tiles outscore it) — the regression this
    # mode exists to prevent.
    assert s.offsets.index((384, 640)) not in {int(i) for i in block_idx}


def test_select_clusters_prefers_whole_tile_over_cut_tile():
    """Points within the depth buffer of tile A's interior edge but deep
    inside neighbor B's interior must guarantee B, not A (B is where the
    car is whole and survives border suppression)."""
    s = _selector()
    # A = (0, 0): interior x1 zoomed = (640-8)*0.5 = 316, buffered 300.
    # B = (0, 448): interior x0 zoomed = (448+8)*0.5 = 228, buffered 244.
    pts = [(x, y) for x in range(302, 314, 2) for y in range(100, 112, 2)]
    fg = _fake_fg(pts, [0] * len(pts))
    idx, _, guar = jax.jit(lambda f: s.select_clusters(f, 1))(fg)
    assert int(guar) == 1
    assert int(idx[0]) == s.offsets.index((0, 448))


def test_select_clusters_noise_gets_no_guarantee():
    s = _selector()
    pts = [(50, 50), (300, 300)]
    fg = _fake_fg(pts, [-1, -1])
    _, _, guar = jax.jit(lambda f: s.select_clusters(f, 2))(fg)
    assert int(guar) == 0


def test_selector_shape_mismatch_raises():
    s = _selector()
    with pytest.raises(ValueError):
        s.scores(jnp.zeros((256, 320), jnp.float32))


@pytest.mark.slow
def test_all_tiles_selected_equals_full_grid():
    """detect_tiled_fn(tile_indices=arange(n)) must be bit-identical to the
    full grid (same tiles, same order, same merge pool)."""
    rng = np.random.default_rng(3)
    canvas, _ = _paste_scene_on_canvas(rng, 1024, 1280, 4, 3)
    det = Detector(
        DetectorConfig(
            input_width=640,
            input_height=640,
            conf_thresh=0.25,
            max_detections=16,
        ),
        variant="n",
        variables=load_variables(os.path.join(WEIGHTS_DIR, "car_synth_n.npz")),
        dtype=jnp.float32,
    )
    s = _selector()
    full = jax.device_get(
        jax.jit(lambda im: det.detect_tiled_fn(im, tile=640))(canvas)
    )
    gated = jax.device_get(
        jax.jit(
            lambda im: det.detect_tiled_fn(
                im,
                tile=640,
                tile_indices=jnp.arange(s.n_tiles, dtype=jnp.int32),
            )
        )(canvas)
    )
    np.testing.assert_array_equal(full.valid, gated.valid)
    np.testing.assert_array_equal(full.xywh, gated.xywh)
    np.testing.assert_array_equal(full.confidence, gated.confidence)


@pytest.mark.slow
def test_topk_radar_end_to_end_equals_full_grid():
    """Radar(car_tile_topk=K) vs Radar(full grid) on frames whose LiDAR
    foreground covers every car (points rendered inside each GT box, the
    test_tiled e2e harness): the gated pipeline must produce the same
    detected/located robots, proving locate-first reordering + per-frame
    tile re-selection keep the fused program's semantics."""
    rng = np.random.default_rng(5)
    canvas, gts = _paste_scene_on_canvas(rng, 1024, 1280, 3, 5)
    assert len(gts) >= 2

    fx = fy = 1000.0
    ppx, ppy = 640.0, 512.0
    calib = Calibration(
        intrinsic=((fx, 0.0, ppx), (0.0, fy, ppy), (0.0, 0.0, 1.0)),
        lidar_to_camera=tuple(map(tuple, np.eye(4))),
        world_to_camera=tuple(map(tuple, np.eye(4))),
    )

    def points_at(boxes, z_mm):
        pts = []
        for x, y, w, h in boxes:
            us = x + w * (0.25 + 0.5 * np.arange(4) / 3.0)
            vs = y + h * (0.25 + 0.5 * np.arange(4) / 3.0)
            for u in us:
                for v in vs:
                    pts.append(
                        ((u - ppx) * z_mm / fx, (v - ppy) * z_mm / fy, z_mm)
                    )
        return np.asarray(pts, np.float32)

    def make_radar(topk):
        cfg = RadarConfig(
            detector=RobotDetectorConfig(
                max_cars=4,
                input_width=640,
                input_height=640,
                armor_input_width=320,
                armor_input_height=320,
                car_tile=640,
                car_tile_overlap=192,
                car_tile_topk=topk,
            ),
            locator=LocatorConfig(
                image_width=1280,
                image_height=1024,
                max_distance=1e9,
                max_points=128,
                max_foreground=256,
                cc_iterations=6,
            ),
            tracker=TrackerConfig(class_num=12),
            calibration=calib,
        )
        return Radar(
            cfg,
            car_variant="n",
            armor_variant="n",
            car_variables=load_variables(
                os.path.join(WEIGHTS_DIR, "car_synth_n.npz")
            ),
            armor_variables=load_variables(
                os.path.join(WEIGHTS_DIR, "armor_synth_n_320.npz")
            ),
            dtype=jnp.float32,
        )

    bg = points_at(gts, 10000.0)
    cloud = points_at(gts, 8000.0)

    results = {}
    for topk in (0, 4):
        radar = make_radar(topk)
        radar.update_background_cloud(bg)
        last = []
        for i in range(5):
            last = radar.run_once(
                Frame(
                    image=canvas, point_cloud=cloud, timestamp=0.1 * (i + 1)
                )
            )
        results[topk] = last

    full, gated = results[0], results[4]
    # Same robots detected (rects pair up exactly), same locations.
    assert len(full) == len(gated) > 0
    for rf in full:
        match = [
            rg
            for rg in gated
            if _iou(np.asarray(rf.rect, np.float64), np.asarray(rg.rect, np.float64)) > 0.99
        ]
        assert len(match) == 1, (rf.rect, [rg.rect for rg in gated])
        rg = match[0]
        assert rf.is_located == rg.is_located
        if rf.is_located:
            np.testing.assert_allclose(
                np.asarray(rf.location),
                np.asarray(rg.location),
                rtol=0,
                atol=1e-5,
            )
    located = [r for r in gated if r.is_located]
    assert located  # the harness guarantees locatable cars
