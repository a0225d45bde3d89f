"""End-to-end pipeline integration tests on tiny shapes.

Mirrors the reference sample flow (samples/sample_radar.h:106-127): build a
Radar with small models/images, feed synthetic frames with a known object in
both the image (irrelevant for random weights — structure only) and the
cloud, and check the plumbing: RobotBatch shapes, locate fusion, tracker
lifecycle across frames.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rm_radar_tpu.configs import (
    Calibration,
    LocatorConfig,
    RadarConfig,
    RobotDetectorConfig,
    TrackerConfig,
)
from rm_radar_tpu.detect.detector import RobotDetector
from rm_radar_tpu.pipeline import Radar
from rm_radar_tpu.types import Frame

IDENTITY_CALIB = Calibration(
    intrinsic=((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)),
    lidar_to_camera=tuple(map(tuple, np.eye(4))),
    world_to_camera=tuple(map(tuple, np.eye(4))),
)

TINY = RadarConfig(
    detector=RobotDetectorConfig(
        max_cars=4,
        max_armors_per_car=4,
        input_width=64,
        input_height=64,
        armor_input_width=64,
        armor_input_height=64,
        armor_conf_thresh=0.95,  # random weights: keep detections sparse
        car_conf_thresh=0.95,
    ),
    locator=LocatorConfig(
        image_width=128,
        image_height=96,
        min_depth_diff=0.5,
        max_depth_diff=4.0,
        cluster_tolerance=100.0,
        max_distance=1e9,
        max_points=256,
        max_foreground=128,
        cc_iterations=6,
    ),
    tracker=TrackerConfig(class_num=12),
    calibration=IDENTITY_CALIB,
)


@pytest.fixture(scope="module")
def radar():
    return Radar(TINY, car_variant="n", armor_variant="n", dtype=jnp.float32)


@pytest.mark.slow
def test_robot_detector_cascade_shapes(radar):
    img = np.random.default_rng(0).integers(
        0, 255, size=(96, 128, 3), dtype=np.uint8
    )
    batch = radar.detector.detect(img)
    cfg = TINY.detector
    assert batch.rect.shape == (cfg.max_cars, 4)
    assert batch.armor_xywh.shape == (cfg.max_cars, cfg.max_armors_per_car, 4)
    assert batch.valid.dtype == bool
    # Invalid slots must carry no armors.
    av = np.asarray(batch.armor_valid)
    v = np.asarray(batch.valid)
    assert not av[~v].any()


@pytest.mark.slow
def test_run_once_end_to_end(radar):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    cloud = rng.uniform(1.0, 5.0, size=(100, 3)).astype(np.float32)
    robots = radar.run_once(Frame(image=img, point_cloud=cloud, timestamp=0.0))
    assert isinstance(robots, list)
    # Second frame exercises locator queue + tracker dt path.
    robots = radar.run_once(Frame(image=img, point_cloud=cloud, timestamp=0.1))
    assert isinstance(robots, list)


@pytest.mark.slow
def test_run_batch_multicamera(radar):
    """Two-camera batched step on the 8-virtual-device mesh: vmapped fused
    program with the camera axis sharded over DATA_AXIS."""
    from rm_radar_tpu.parallel.mesh import make_mesh
    from rm_radar_tpu.utils.io import pad_points

    rng = np.random.default_rng(2)
    images = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    clouds = np.stack(
        [
            pad_points(
                rng.uniform(1.0, 5.0, size=(50, 3)).astype(np.float32),
                TINY.locator.max_points,
            )
            for _ in range(2)
        ]
    )
    mesh = make_mesh(n_data=2)
    results, states, trackers = radar.run_batch(
        images, clouds, [0.0, 0.0], mesh=mesh
    )
    assert len(results) == 2
    assert len(trackers) == 2
    # Second step reuses states/trackers.
    results, states, trackers = radar.run_batch(
        images, clouds, [0.1, 0.1], states=states, trackers=trackers, mesh=mesh
    )
    assert len(results) == 2


@pytest.mark.slow
def test_run_once_tracked_fully_on_device(radar):
    """The fully-fused device-tracked step must run end-to-end and carry
    tracker state across frames (one XLA program per frame)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    cloud = rng.uniform(1.0, 5.0, size=(100, 3)).astype(np.float32)
    from rm_radar_tpu.types import Frame as F

    carry = None
    for t in range(3):
        robots, carry = radar.run_once_tracked(
            F(image=img, point_cloud=cloud, timestamp=0.1 * t), carry
        )
        assert isinstance(robots, list)
    loc_state, store = carry
    assert int(np.asarray(store.next_id)) >= 0


@pytest.mark.slow
def test_run_stream_buckets_escalate(radar):
    """Bucketed stream: runs in the small bucket, escalates when it fills,
    results structurally consistent."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    cloud = rng.uniform(1.0, 5.0, size=(100, 3)).astype(np.float32)

    def gen(n):
        from rm_radar_tpu.types import Frame as F

        for t in range(n):
            yield F(image=img, point_cloud=cloud, timestamp=0.1 * t)

    results = list(radar.run_stream(gen(6), buckets=(2,)))
    assert len(results) == 6
    for robots in results:
        assert isinstance(robots, list)


@pytest.mark.slow
def test_run_stream_repair_matches_fixed_capacity():
    """A frame that fills its small bucket is repaired at the next bucket
    before yielding: stream output equals running every frame at the full
    max_cars capacity (the reference's dynamic batch never drops cars,
    detector.cpp:208-227)."""
    import dataclasses

    # Near-zero thresholds: random-weight sigmoid scores (~0.5) pass, so
    # every frame saturates the small bucket and forces a repair.
    cfg = dataclasses.replace(
        TINY,
        detector=dataclasses.replace(
            TINY.detector, car_conf_thresh=0.01, armor_conf_thresh=0.01
        ),
    )
    radar_a = Radar(cfg, car_variant="n", armor_variant="n", dtype=jnp.float32)
    radar_b = Radar(cfg, car_variant="n", armor_variant="n", dtype=jnp.float32)

    rng = np.random.default_rng(7)
    frames = [
        Frame(
            image=rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8),
            point_cloud=rng.uniform(1.0, 5.0, size=(100, 3)).astype(np.float32),
            timestamp=0.1 * t,
        )
        for t in range(4)
    ]

    stream_out = list(radar_a.run_stream(iter(frames), buckets=(2,)))
    fixed_out = [radar_b.run_once(f) for f in frames]

    assert len(stream_out) == len(fixed_out) == 4
    # The repair path must actually have run (a repair program was compiled
    # for the escalated bucket).
    assert any(k[0] == "repair" for k in radar_a._jitted), radar_a._jitted.keys()
    for rs, rf in zip(stream_out, fixed_out):
        assert len(rs) == len(rf)
        for a, b in zip(rs, rf):
            np.testing.assert_allclose(a.rect, b.rect, rtol=1e-5, atol=1e-5)
            assert a.label == b.label
            assert a.track_state == b.track_state
            assert (a.location is None) == (b.location is None)
            if a.location is not None:
                np.testing.assert_allclose(
                    a.location, b.location, rtol=1e-5, atol=1e-5
                )


@pytest.mark.slow
def test_run_stream_repair_uses_device_resident_frame():
    """A repair must consume the device-committed frame handle from the
    first dispatch, never re-upload host numpy (the reference reuses its
    pinned/device buffers across the cascade, detector.cpp:132-148). Guards
    the run_stream re-staging regression: pending entries used to hold the
    raw _prepare_inputs output, so a repair of a host-numpy frame paid a
    full H2D of the image again."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(
        TINY,
        detector=dataclasses.replace(
            TINY.detector, car_conf_thresh=0.01, armor_conf_thresh=0.01
        ),
    )
    radar = Radar(cfg, car_variant="n", armor_variant="n", dtype=jnp.float32)

    seen = {}
    orig_get = radar._get_jitted

    def spy(key, fn, donate=True):
        f = orig_get(key, fn, donate)
        if key[0] != "repair":
            return f

        def wrapped(image, fg):
            seen["image_is_device_array"] = isinstance(image, jax.Array)
            return f(image, fg)

        return wrapped

    radar._get_jitted = spy

    rng = np.random.default_rng(7)
    frames = [
        Frame(
            image=rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8),
            point_cloud=rng.uniform(1.0, 5.0, size=(100, 3)).astype(
                np.float32
            ),
            timestamp=0.1 * t,
        )
        for t in range(3)
    ]
    stats: dict = {}
    list(radar.run_stream(iter(frames), buckets=(2,), stats=stats))
    assert stats["repairs"] >= 1  # the repair path actually ran
    assert seen.get("image_is_device_array") is True


@pytest.mark.slow
def test_run_batch_tracked_device(radar):
    """Fully-fused multi-camera device-tracked step: one XLA program for
    B cameras' detect+locate+track; carries flow across steps."""
    rng = np.random.default_rng(5)
    from rm_radar_tpu.utils.io import pad_points

    images = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    clouds = np.stack(
        [
            pad_points(
                rng.uniform(1.0, 5.0, size=(50, 3)).astype(np.float32),
                TINY.locator.max_points,
            )
            for _ in range(2)
        ]
    )
    results, carries = radar.run_batch_tracked(images, clouds, [0.0, 0.0])
    assert len(results) == 2
    results, carries = radar.run_batch_tracked(
        images, clouds, [0.1, 0.1], carries=carries
    )
    assert len(results) == 2


@pytest.mark.slow
def test_run_stream_batch_matches_run_batch_tracked(radar):
    """run_stream_batch (pipelined dispatch, async fetch) must yield exactly
    what per-tick run_batch_tracked produces — only the schedule differs."""
    rng = np.random.default_rng(11)
    from rm_radar_tpu.utils.io import pad_points

    ticks = []
    for k in range(5):
        images = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
        clouds = np.stack(
            [
                pad_points(
                    rng.uniform(1.0, 5.0, size=(50, 3)).astype(np.float32),
                    TINY.locator.max_points,
                )
                for _ in range(2)
            ]
        )
        ticks.append((images, clouds, [0.1 * k, 0.1 * k]))

    streamed = list(radar.run_stream_batch(iter(ticks), depth=2))
    assert len(streamed) == len(ticks)

    carries = None
    for tick, got in zip(ticks, streamed):
        want, carries = radar.run_batch_tracked(*tick, carries=carries)
        assert len(got) == len(want) == 2
        for cam_got, cam_want in zip(got, want):
            assert len(cam_got) == len(cam_want)
            for rg, rw in zip(cam_got, cam_want):
                assert (rg.label, rg.track_state) == (rw.label, rw.track_state)
                for a, b in (
                    (rg.rect, rw.rect),
                    (rg.armors, rw.armors),
                    (rg.location, rw.location),
                ):
                    assert (a is None) == (b is None)
                    if a is not None:
                        np.testing.assert_array_equal(
                            np.asarray(a), np.asarray(b)
                        )


@pytest.mark.slow
def test_detect_heterogeneous_sizes(radar):
    """Detector.detect accepts a mixed-size image list (reference
    ImageOrImages, detector.h:117-134), grouping by shape and reassembling
    rows in input order."""
    rng = np.random.default_rng(6)
    im_a = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    im_b = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    im_c = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    det = radar.detector.car.detect([im_a, im_b, im_c])
    cap = TINY.detector.max_cars
    assert det.xywh.shape == (3, cap, 4)
    for i, im in enumerate([im_a, im_b, im_c]):
        single = radar.detector.car.detect(im)
        np.testing.assert_allclose(
            np.asarray(det.xywh[i]), np.asarray(single.xywh), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(det.valid[i]), np.asarray(single.valid)
        )


def test_adjust_bucket_logic():
    from rm_radar_tpu.pipeline import Radar

    buckets = (4, 20)
    # saturate bucket 4 -> escalate
    assert Radar._adjust_bucket(4, 4, buckets, 0, 0) == (1, 0)
    # below half of previous bucket for 60 frames -> de-escalate
    cur, quiet = 1, 0
    for _ in range(59):
        cur, quiet = Radar._adjust_bucket(1, 20, buckets, cur, quiet)
        assert cur == 1
    cur, quiet = Radar._adjust_bucket(1, 20, buckets, cur, quiet)
    assert cur == 0
    # at top bucket, saturation stays put
    assert Radar._adjust_bucket(20, 20, buckets, 1, 0) == (1, 0)
    # the quiet threshold is configurable (RadarConfig.stream_deescalate_after)
    cur, quiet = 1, 0
    for _ in range(4):
        cur, quiet = Radar._adjust_bucket(
            1, 20, buckets, cur, quiet, deescalate_after=5
        )
        assert cur == 1
    cur, quiet = Radar._adjust_bucket(
        1, 20, buckets, cur, quiet, deescalate_after=5
    )
    assert (cur, quiet) == (0, 0)


def test_deescalate_after_config_field():
    """RadarConfig carries the stream de-escalation knob with an env
    default (RM_RADAR_DEESCALATE_AFTER), like every other measured knob."""
    import os

    from rm_radar_tpu.configs import RadarConfig

    assert RadarConfig().stream_deescalate_after == 60
    assert RadarConfig(stream_deescalate_after=7).stream_deescalate_after == 7
    os.environ["RM_RADAR_DEESCALATE_AFTER"] = "12"
    try:
        assert RadarConfig().stream_deescalate_after == 12
    finally:
        del os.environ["RM_RADAR_DEESCALATE_AFTER"]


@pytest.mark.slow
def test_run_stream_stats_counters(radar):
    """The stats hook must record frames, bucket occupancy and repair/
    escalation events consistently with the stream's yielded output."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    cloud = rng.uniform(1.0, 5.0, size=(100, 3)).astype(np.float32)

    def gen(n):
        from rm_radar_tpu.types import Frame as F

        for t in range(n):
            yield F(image=img, point_cloud=cloud, timestamp=0.1 * t)

    stats = {}
    out = list(radar.run_stream(gen(6), buckets=(2,), stats=stats))
    assert len(out) == 6
    assert stats["frames"] == 6
    assert sum(stats["bucket_frames"].values()) == 6
    assert stats["repairs"] >= 0 and stats["escalations"] >= 0
