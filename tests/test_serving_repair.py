"""Batched-serving no-detection-dropped guarantee + saturation telemetry.

The reference's dynamic batch always runs the actual car count — it never
drops a detection (reference src/detect/detector.cpp:208-227). Round 3's
batched serving paths ran ONE fixed bucket with saturation telemetry that
could not distinguish "full but exact" from "clipped". Round 4 closes it:

* the car stage counts NMS survivors at the FULL config.max_cars capacity,
  so ``RobotBatch.n_cars > bucket`` unambiguously means clipping
  (detect/detector.py detect_fn);
* run_stream_batch(buckets=...) rolls back and replays a clipped tick (and
  all younger in-flight ticks) at the covering bucket BEFORE the on-device
  tracker's state is consumed downstream, so streamed results equal the
  fixed-max-capacity stream exactly;
* above-conf_thresh anchor counts are reported per stage so top-K NMS
  saturation (the one regime diverging from the reference's all-pairs NMS,
  detector.cu:315-360) is observable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rm_radar_tpu.ops.detect_ops import postprocess
from rm_radar_tpu.types import PreParams

from test_pipeline import TINY


def _mk_radar(cfg):
    from rm_radar_tpu.pipeline import Radar

    return Radar(cfg, car_variant="n", armor_variant="n", dtype=jnp.float32)


# Low thresholds: random-weight detections saturate the car capacity, the
# worst case for bucket clipping.
BUSY = dataclasses.replace(
    TINY,
    detector=dataclasses.replace(
        TINY.detector, car_conf_thresh=0.01, armor_conf_thresh=0.01
    ),
)


@pytest.mark.slow
def test_n_cars_is_true_count_and_bucket_slices_are_prefixes():
    """n_cars must be the full-capacity survivor count regardless of the
    bucket, and a small bucket's detections must be exactly the top-bucket
    prefix of the full run (same order, same boxes)."""
    from rm_radar_tpu.detect.detector import RobotDetector

    det = RobotDetector(BUSY.detector, "n", "n", dtype=jnp.float32)
    img = np.random.default_rng(3).integers(
        0, 255, size=(96, 128, 3), dtype=np.uint8
    )
    full = jax.jit(lambda im: det.detect_fn(im, max_cars=4))(img)
    small = jax.jit(lambda im: det.detect_fn(im, max_cars=2))(img)

    n_full = int(full.n_cars)
    assert n_full > 2, "scene must overflow the small bucket for this test"
    # True count identical across buckets (the probe runs at capacity).
    assert int(small.n_cars) == n_full
    # The small bucket's cars are the confidence-ordered prefix.
    np.testing.assert_allclose(
        np.asarray(small.rect), np.asarray(full.rect)[:2], atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(small.valid), np.asarray(full.valid)[:2]
    )
    # Telemetry present and consistent.
    assert int(small.nms_candidates_car) == int(full.nms_candidates_car) > 0


@pytest.mark.slow
def test_run_stream_batch_repair_equals_fixed_max_capacity():
    """A scene that overflows the starting bucket: the bucketed stream's
    results (including on-device track state) must equal the fixed
    full-capacity stream tick for tick — no detection ever dropped."""
    from test_sharded_tracked import _frames

    rng = np.random.default_rng(11)
    b = 2
    images, cloud = _frames(b, rng, BUSY)
    clds = [np.stack([cloud(8.0)] * b)] + [
        np.stack([cloud(6.0)] * b) for _ in range(4)
    ]
    ticks = [(images, clds[t], [0.1 * (t + 1)] * b) for t in range(5)]

    radar_bucketed, radar_fixed = _mk_radar(BUSY), _mk_radar(BUSY)
    stats: dict = {}
    streamed = list(
        radar_bucketed.run_stream_batch(
            iter(ticks), depth=2, buckets=(2,), stats=stats
        )
    )
    # The premise: the small bucket actually clipped and was repaired.
    assert stats["replays"] >= 1 and stats["clipped_ticks"] >= 1
    assert stats["max_n_cars"] > 2

    fixed = list(radar_fixed.run_stream_batch(iter(ticks), depth=2))
    assert len(streamed) == len(fixed) == len(ticks)
    n_tracked = 0
    for got_tick, want_tick in zip(streamed, fixed):
        for cam in range(b):
            assert len(got_tick[cam]) == len(want_tick[cam])
            for a, u in zip(got_tick[cam], want_tick[cam]):
                np.testing.assert_allclose(a.rect, u.rect, atol=1e-5)
                assert a.label == u.label
                assert a.track_state == u.track_state
                assert (a.location is None) == (u.location is None)
                if a.location is not None:
                    np.testing.assert_allclose(
                        a.location, u.location, atol=1e-4
                    )
                n_tracked += a.track_state is not None
    assert n_tracked > 0


@pytest.mark.slow
def test_run_stream_batch_unbucketed_still_reports_clipping():
    """buckets=None keeps the fixed-bucket fast path (donation on) but the
    telemetry must still expose overflow — the measured-proof-plus-alarm
    alternative for deployments that pin one bucket."""
    from test_sharded_tracked import _frames

    small = dataclasses.replace(
        BUSY,
        detector=dataclasses.replace(BUSY.detector, max_cars=2),
    )
    rng = np.random.default_rng(12)
    b = 2
    images, cloud = _frames(b, rng, small)
    ticks = [
        (images, np.stack([cloud(8.0)] * b), [0.1 * (t + 1)] * b)
        for t in range(3)
    ]
    radar = _mk_radar(small)
    stats: dict = {}
    # max_cars == capacity == 2: n_cars is capped at the probe capacity, so
    # at-capacity is the strongest signal available — clipped_ticks counts
    # n_cars > bucket which cannot trigger here; max_n_cars == bucket shows
    # the capacity itself is the binding constraint.
    list(radar.run_stream_batch(iter(ticks), depth=1, stats=stats))
    assert stats["ticks"] == 3
    assert stats["max_n_cars"] == 2  # pinned at capacity -> raise max_cars
    assert stats["nms_candidates_car_max"] > 0


def test_postprocess_candidate_count_and_saturation():
    """Synthetic raw tensor with a known above-threshold anchor population,
    including the saturating regime (> top_k)."""
    anchors = 64
    classes = 2
    rng = np.random.default_rng(0)
    raw = np.zeros((4 + classes, anchors), np.float32)
    raw[:4] = rng.uniform(10, 20, size=(4, anchors))
    # 40 anchors above conf 0.5, the rest below.
    raw[4, :40] = 0.9
    raw[4, 40:] = 0.1
    pparam = PreParams(
        width=jnp.float32(128.0),
        height=jnp.float32(96.0),
        ratio=jnp.float32(1.0),
        dw=jnp.float32(0.0),
        dh=jnp.float32(0.0),
    )
    dets, n_cand = postprocess(
        jnp.asarray(raw),
        pparam,
        nms_thresh=0.65,
        conf_thresh=0.5,
        top_k=16,
        max_detections=8,
        with_candidate_count=True,
    )
    assert int(n_cand) == 40
    assert int(n_cand) > 16  # the saturated regime is exactly what the
    # telemetry exists to flag: count > top_k means the top-K pool clipped
    # the all-pairs NMS population.
    # Plain call keeps the old single-value return.
    dets2 = postprocess(
        jnp.asarray(raw), pparam, 0.65, 0.5, 16, 8
    )
    np.testing.assert_array_equal(
        np.asarray(dets.valid), np.asarray(dets2.valid)
    )


@pytest.mark.slow
def test_robot_batch_carries_nms_telemetry():
    from rm_radar_tpu.detect.detector import RobotDetector

    det = RobotDetector(BUSY.detector, "n", "n", dtype=jnp.float32)
    img = np.random.default_rng(5).integers(
        0, 255, size=(96, 128, 3), dtype=np.uint8
    )
    batch = det.detect(img)
    assert int(batch.nms_candidates_car) > 0
    assert np.asarray(batch.nms_candidates_armor).shape == ()
