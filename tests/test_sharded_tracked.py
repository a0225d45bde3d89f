"""Sharded device-tracked batch path: equivalence + real-shape partitioning.

The headline serving mode (run_batch_tracked: detect+locate+track for all
cameras in ONE XLA program, camera axis sharded over the mesh — SURVEY.md
§2.7, scaling the reference loop samples/sample_radar.h:106-127) must:

* produce the same results sharded as unsharded, and the same as per-camera
  host trackers (tracker semantics: reference src/track/tracker.cpp);
* actually partition the camera axis at the real 2592x2048 shapes — no
  silent replication (asserted through the compiled executable's sharding
  specs and per-device memory stats).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rm_radar_tpu.configs import (
    LocatorConfig,
    RadarConfig,
    RobotDetectorConfig,
)
from rm_radar_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rm_radar_tpu.pipeline import Radar
from rm_radar_tpu.utils.io import pad_points

from test_pipeline import TINY


def _mk_radar(cfg):
    return Radar(cfg, car_variant="n", armor_variant="n", dtype=jnp.float32)


def _frames(b, rng, cfg):
    images = rng.integers(0, 255, size=(b, 96, 128, 3), dtype=np.uint8)

    def cloud(z):
        # Identity calibration: u = x * zoom / z, v = y * zoom / z. Points
        # spread over the zoomed 64x48 image at depth z.
        u = rng.uniform(2, 62, size=50)
        v = rng.uniform(2, 46, size=50)
        pts = np.stack([u * z / 0.5, v * z / 0.5, np.full(50, z)], -1)
        return pad_points(
            pts.astype(np.float32), cfg.locator.max_points
        )

    return images, cloud


@pytest.mark.slow
def test_sharded_tracked_equals_unsharded_equals_host():
    cfg = dataclasses.replace(
        TINY,
        detector=dataclasses.replace(
            TINY.detector, car_conf_thresh=0.01, armor_conf_thresh=0.01
        ),
    )
    rng = np.random.default_rng(11)
    b = 2
    images, cloud = _frames(b, rng, cfg)
    # Frame 0 builds a deep background (z=8); later frames return nearer
    # points (z=6, diff=2 within [0.5, 4]) so foreground forms and robots
    # get located -> the tracker lifecycle actually runs.
    clds = [np.stack([cloud(8.0)] * b)] + [
        np.stack([cloud(6.0)] * b) for _ in range(3)
    ]

    mesh = make_mesh(n_data=b, devices=jax.devices()[:b])
    radar_s, radar_u, radar_h = _mk_radar(cfg), _mk_radar(cfg), _mk_radar(cfg)
    carries_s = carries_u = None
    states = trackers = None
    n_tracked = 0
    for t in range(4):
        ts = [0.1 * (t + 1)] * b
        rs, carries_s = radar_s.run_batch_tracked(
            images, clds[t], ts, carries=carries_s, mesh=mesh
        )
        ru, carries_u = radar_u.run_batch_tracked(
            images, clds[t], ts, carries=carries_u
        )
        rh, states, trackers = radar_h.run_batch(
            images, clds[t], ts, states=states, trackers=trackers
        )
        assert len(rs) == len(ru) == len(rh) == b
        for cam in range(b):
            assert len(rs[cam]) == len(ru[cam]) == len(rh[cam])
            for a, u, h in zip(rs[cam], ru[cam], rh[cam]):
                np.testing.assert_allclose(a.rect, u.rect, atol=1e-5)
                np.testing.assert_allclose(a.rect, h.rect, atol=1e-5)
                assert a.label == u.label == h.label
                assert a.track_state == u.track_state == h.track_state
                assert (
                    (a.location is None)
                    == (u.location is None)
                    == (h.location is None)
                )
                if a.location is not None:
                    np.testing.assert_allclose(
                        a.location, u.location, atol=1e-4
                    )
                    np.testing.assert_allclose(
                        a.location, h.location, atol=1e-4
                    )
                n_tracked += a.track_state is not None
    # The comparison must not be vacuous: tracks actually spawned.
    assert n_tracked > 0


@pytest.mark.slow
def test_run_stream_batch_sharded_matches_unsharded():
    """The pipelined serving loop (run_stream_batch) over the mesh must
    yield what the unsharded per-tick run_batch_tracked produces."""
    cfg = dataclasses.replace(
        TINY,
        detector=dataclasses.replace(
            TINY.detector, car_conf_thresh=0.01, armor_conf_thresh=0.01
        ),
    )
    rng = np.random.default_rng(12)
    b = 2
    images, cloud = _frames(b, rng, cfg)
    clds = [np.stack([cloud(8.0)] * b)] + [
        np.stack([cloud(6.0)] * b) for _ in range(3)
    ]
    ticks = [
        (images, clds[t], [0.1 * (t + 1)] * b) for t in range(4)
    ]

    mesh = make_mesh(n_data=b, devices=jax.devices()[:b])
    radar_s, radar_u = _mk_radar(cfg), _mk_radar(cfg)
    streamed = list(radar_s.run_stream_batch(iter(ticks), depth=2, mesh=mesh))
    assert len(streamed) == len(ticks)
    carries = None
    n_tracked = 0
    for tick, got in zip(ticks, streamed):
        want, carries = radar_u.run_batch_tracked(*tick, carries=carries)
        for cam in range(b):
            assert len(got[cam]) == len(want[cam])
            for a, u in zip(got[cam], want[cam]):
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
def test_full_shape_batch8_partitions_camera_axis():
    """Compile the REAL-shape batch-8 device-tracked program (2592x2048
    frames, armor@320, 8-car buckets) on the 8-device CPU mesh and assert
    the camera axis is genuinely partitioned: the executable's input/output
    shardings carry the data axis, and per-device temp memory stays near the
    single-camera program's (replication of the camera batch would blow it
    up ~8x)."""
    n = 8
    if len(jax.devices()) < n:
        pytest.skip("needs 8 virtual devices")
    config = RadarConfig(
        detector=RobotDetectorConfig(
            max_cars=8,
            armor_input_width=320,
            armor_input_height=320,
        ),
        locator=LocatorConfig(),
    )
    radar = _mk_radar(config)
    mesh = make_mesh(n_data=n, devices=jax.devices()[:n])

    imgs = jax.ShapeDtypeStruct((n, 2048, 2592, 3), jnp.uint8)
    clds = jax.ShapeDtypeStruct(
        (n, config.locator.max_points, 3), jnp.float32
    )
    ts = jax.ShapeDtypeStruct((n,), jnp.float32)
    carries = jax.eval_shape(lambda: radar.make_batch_tracked_state(n))

    step = radar.batch_step(mesh, tracked=True)
    compiled = step.lower(carries, imgs, clds, ts).compile()

    in_shardings = jax.tree_util.tree_leaves(compiled.input_shardings)
    assert in_shardings, "no input shardings reported"
    for s in in_shardings:
        spec = getattr(s, "spec", None)
        if spec is not None:
            assert spec[0] == DATA_AXIS, (s, spec)
        else:  # GSPMD form: at minimum, not replicated
            assert not s.is_fully_replicated, s
    out_shardings = jax.tree_util.tree_leaves(compiled.output_shardings)
    for s in out_shardings:
        spec = getattr(s, "spec", None)
        if spec is not None:
            assert spec[0] == DATA_AXIS, (s, spec)
        else:
            assert not s.is_fully_replicated, s

    # Memory evidence of partitioning: the 8-camera sharded program's
    # per-device temp footprint must be in the single-camera class, not 8x.
    single = jax.jit(
        lambda c, i, p, t: radar._frame_fn_tracked(c, i, p, t, crop_window=0)
    ).lower(
        jax.eval_shape(lambda: radar.make_tracked_state()),
        jax.ShapeDtypeStruct((2048, 2592, 3), jnp.uint8),
        jax.ShapeDtypeStruct((config.locator.max_points, 3), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    ).compile()
    try:
        mem8 = compiled.memory_analysis()
        mem1 = single.memory_analysis()
        t8 = getattr(mem8, "temp_size_in_bytes", None)
        t1 = getattr(mem1, "temp_size_in_bytes", None)
    except Exception:
        t8 = t1 = None
    if t8 is None or t1 is None or t1 == 0:
        pytest.skip("memory_analysis unavailable on this backend")
    assert t8 < 3.0 * t1 + (64 << 20), (t8, t1)
