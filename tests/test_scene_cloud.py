"""Scene-correlated synthetic clouds drive the locate stage end-to-end.

The generator (train/synth.py::make_scene_cloud) must produce clouds whose
car-surface returns become foreground pixels, cluster, and let search locate
the cars at their ground-truth rects — the property the bench relies on for
realistic locate/track occupancy (reference: images and clouds of the same
scene, samples/main.cpp:74-99).
"""

import numpy as np
import pytest

from rm_radar_tpu.configs import Calibration, LocatorConfig
from rm_radar_tpu.geometry import LidarCalib, lidar_to_world
from rm_radar_tpu.locate.locator import (
    cluster,
    make_state,
    search_one,
    update,
)
from rm_radar_tpu.train.synth import (
    make_background_cloud,
    make_scene,
    make_scene_cloud,
)
from rm_radar_tpu.utils.io import pad_points


@pytest.fixture(scope="module")
def located_scene():
    rng = np.random.default_rng(3)
    scene = make_scene(
        rng, 2048, 2592, max_cars=6, n_cars=4, car_size=(180, 660)
    )
    assert len(scene.car_xywh) == 4
    config = LocatorConfig()
    calibration = Calibration()
    calib = LidarCalib.create(
        calibration.intrinsic_np(),
        calibration.lidar_to_camera_np(),
        calibration.world_to_camera_np(),
        config.zoom_factor,
    )
    bg = make_background_cloud(rng, 2048, 2592, calibration)
    cloud = make_scene_cloud(rng, scene, calibration)
    assert bg.shape[0] <= config.max_points
    assert cloud.shape[0] <= config.max_points

    state = make_state(config)
    state, _ = update(
        state, pad_points(bg, config.max_points), calib, config
    )
    state, diff = update(
        state, pad_points(cloud, config.max_points), calib, config
    )
    fg = cluster(
        diff,
        calib,
        config,
        candidates=(state.pix_queue, state.depth_queue),
    )
    return scene, config, calib, fg


def test_foreground_forms_clusters(located_scene):
    scene, config, calib, fg = located_scene
    n_fg = int(np.sum(np.asarray(fg.valid)))
    # Every car contributes its in-box lattice returns as foreground.
    assert n_fg >= config.min_cluster_size * len(scene.car_xywh)
    clusters = np.asarray(fg.cluster)
    roots = np.unique(clusters[(clusters >= 0) & np.asarray(fg.valid)])
    assert len(roots) >= len(scene.car_xywh)


def test_search_locates_every_car(located_scene):
    scene, config, calib, fg = located_scene
    for rect in scene.car_xywh:
        loc_m, located = search_one(
            np.asarray(rect, np.float32), fg, calib, config
        )
        assert bool(located), f"car at {rect} not located"
        loc = np.asarray(loc_m)
        assert np.all(np.isfinite(loc))
        # Location should be meters-scale field coordinates (< 35 m).
        assert np.all(np.abs(loc) < 35.0)


def test_terrain_is_not_foreground(located_scene):
    """Terrain returns sit at the background depth (|delta| << 500 mm) and
    must not pollute the foreground: foreground count stays near the
    car-return count, nowhere near the 9k terrain returns."""
    scene, config, calib, fg = located_scene
    n_fg = int(np.sum(np.asarray(fg.valid)))
    assert n_fg <= 150 * len(scene.car_xywh)


def test_hard_scenes_carry_aimed_plate_occlusion():
    """Distribution guard for the hard tier's durable difficulty axis
    (train/synth.py::make_scene aimed placement): across many hard scenes a
    meaningful share of plates must be partially covered by later cars —
    if this silently regresses, the hard accuracy tier re-saturates and
    stops detecting regressions (PERF.md "Hard-tier hardening")."""
    rng = np.random.default_rng(1000)  # the gate tier's seed
    vis = []
    for _ in range(24):
        s = make_scene(rng, 2048, 2592, max_cars=6, car_size=(180, 660),
                       hard=True)
        vis.extend(np.asarray(s.armor_visible).tolist())
    vis = np.asarray(vis)
    assert len(vis) >= 48
    occluded = float(np.mean(vis < 0.9))
    deep = float(np.mean(vis < 0.6))
    assert 0.08 <= occluded <= 0.5, (occluded, deep)
    assert deep >= 0.04, (occluded, deep)


def test_easy_scenes_have_fully_visible_plates():
    """Easy scenes allow zero car overlap, so every plate is fully visible
    — the easy tier must stay a clean P/R/label-1.0 regression anchor."""
    rng = np.random.default_rng(4242)
    for _ in range(8):
        s = make_scene(rng, 2048, 2592, max_cars=6, car_size=(180, 660))
        assert np.all(np.asarray(s.armor_visible) >= 0.999)
