"""Singer-EKF behavioral tests, mirroring the reference suite
(test/track/singer_test.cpp:29-122): the filter must converge on static,
uniform-velocity and accelerated targets within 1e-1 relative after 10 steps.
Also checks the jnp batched implementation against the host numpy one used by
the tracker.
"""

import jax.numpy as jnp
import numpy as np

from rm_radar_tpu.track import singer
from rm_radar_tpu.track.kalman import GaussianState
from rm_radar_tpu.track.tracker import _process_noise_np, _transition_np

MAX_A = 2.0
TAU = 1.0
OBS_NOISE = jnp.eye(3) * 0.2


def _make_filter():
    return GaussianState(
        jnp.zeros(9, jnp.float32), jnp.eye(9, dtype=jnp.float32) * 0.5
    )


def _run(measurements, dt=1.0):
    gs = _make_filter()
    for z in measurements:
        gs = singer.predict(gs, dt, TAU, MAX_A)
        gs = singer.update(gs, jnp.asarray(z, jnp.float32), OBS_NOISE)
    return np.asarray(gs.mean)


def test_static_target():
    z = np.array([10.0, 20.0, 30.0])
    state = _run([z] * 10)
    np.testing.assert_allclose(state[0::3], z, rtol=1e-1)


def test_uniform_motion():
    init = np.array([10.0, 20.0, 30.0])
    vel = np.array([2.0, 4.0, 6.0])
    state = _run([init + i * vel for i in range(10)])
    np.testing.assert_allclose(state[0::3], init + 9 * vel, rtol=1e-1)
    np.testing.assert_allclose(state[1::3], vel, rtol=1e-1)
    assert np.all(np.abs(state[2::3]) < 1e-1)


def test_accelerated_motion():
    init = np.array([10.0, 20.0, 30.0])
    vel = np.array([2.0, 4.0, 6.0])
    acc = np.array([0.0, 0.5, 1.0])
    state = _run([init + vel * i + 0.5 * acc * i * i for i in range(10)])
    np.testing.assert_allclose(
        state[0::3], init + vel * 9 + 0.5 * acc * 81, rtol=1e-1
    )
    np.testing.assert_allclose(state[1::3], vel + acc * 9, rtol=1e-1)


def test_transition_matrix_structure():
    f = np.asarray(singer.singer_transition(0.5, TAU))
    # Per-axis block [[1, dt, dt^2/2], [0, 1, dt], [0, 0, exp(-dt/tau)]]
    for i in range(3):
        b = f[3 * i : 3 * i + 3, 3 * i : 3 * i + 3]
        np.testing.assert_allclose(
            b,
            [[1.0, 0.5, 0.125], [0.0, 1.0, 0.5], [0.0, 0.0, np.exp(-0.5)]],
            rtol=1e-6,
        )
    # Off-diagonal (cross-axis) blocks are zero.
    assert np.count_nonzero(f) == 3 * 6


def test_jnp_matches_host_numpy():
    # The host tracker's numpy EKF must agree with the canonical jnp one.
    dt = 0.1
    np.testing.assert_allclose(
        np.asarray(singer.singer_transition(dt, TAU)),
        _transition_np(dt, TAU),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(singer.singer_process_noise(dt, TAU, MAX_A)),
        _process_noise_np(dt, TAU, MAX_A),
        rtol=1e-5,
        atol=1e-7,
    )


def test_batched_predict_update():
    # vmap-free batching: 4 tracks at once equals 4 single-track runs.
    locs = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 3)).astype(np.float32)
    )
    gs = singer.initial_state(locs)
    assert gs.mean.shape == (4, 9)
    gs = singer.predict(gs, jnp.full((4,), 0.5), TAU, MAX_A)
    gs = singer.update(gs, locs, OBS_NOISE)
    for i in range(4):
        g1 = singer.initial_state(locs[i])
        g1 = singer.predict(g1, 0.5, TAU, MAX_A)
        g1 = singer.update(g1, locs[i], OBS_NOISE)
        np.testing.assert_allclose(
            np.asarray(gs.mean[i]), np.asarray(g1.mean), atol=1e-5
        )
