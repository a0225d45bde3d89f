"""KF/EKF golden-value tests.

The expected numbers are the filterpy-generated values embedded in the
reference tests (test/track/kf_test.cpp:43-81, test/track/ekf_test.cpp:
68-113): a 4-state/2-measurement constant-velocity filter, one
predict+update with z = (0.5, 0.5).
"""

import jax.numpy as jnp
import numpy as np

from rm_radar_tpu.track import kalman

EXPECTED_STATE = np.array([0.47727273, 0.47727273, 0.22727273, 0.22727273])
EXPECTED_COV = np.array(
    [
        [0.09545455, 0.0, 0.04545455, 0.0],
        [0.0, 0.09545455, 0.0, 0.04545455],
        [0.04545455, 0.0, 0.64545455, 0.0],
        [0.0, 0.04545455, 0.0, 0.64545455],
    ]
)

F = jnp.array(
    [[1.0, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32
)
Q = jnp.eye(4) * 0.1
H = jnp.array([[1.0, 0, 0, 0], [0, 1, 0, 0]], jnp.float32)
R = jnp.eye(2) * 0.1
Z = jnp.array([0.5, 0.5])


def test_kf_filterpy_golden():
    gs = kalman.GaussianState(jnp.zeros(4), jnp.eye(4))
    gs = kalman.kf_predict(gs, F, Q)
    gs = kalman.kf_update(gs, Z, H, R)
    np.testing.assert_allclose(np.asarray(gs.mean), EXPECTED_STATE, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs.cov), EXPECTED_COV, atol=1e-5)


def test_ekf_filterpy_golden():
    # EKF with locally-linear transition equals the KF on this model
    # (reference ekf_test.cpp uses the same filterpy numbers).
    gs = kalman.GaussianState(jnp.zeros(4), jnp.eye(4))
    gs = kalman.ekf_predict(gs, F, Q)
    predicted = gs.mean[:2]
    gs = kalman.ekf_update(gs, Z, predicted, H, R)
    np.testing.assert_allclose(np.asarray(gs.mean), EXPECTED_STATE, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs.cov), EXPECTED_COV, atol=1e-5)


def test_kf_batched_matches_single():
    # The batched (vmap-style broadcast) path must agree with single-track.
    batch = 5
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(size=(batch, 4)).astype(np.float32))
    covs = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    zs = jnp.asarray(rng.normal(size=(batch, 2)).astype(np.float32))

    gs = kalman.GaussianState(means, covs)
    gs = kalman.kf_predict(gs, F[None], Q[None])
    gs = kalman.kf_update(gs, zs, H[None], R[None])

    for i in range(batch):
        g1 = kalman.GaussianState(means[i], covs[i])
        g1 = kalman.kf_predict(g1, F, Q)
        g1 = kalman.kf_update(g1, zs[i], H, R)
        np.testing.assert_allclose(np.asarray(gs.mean[i]), np.asarray(g1.mean), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs.cov[i]), np.asarray(g1.cov), atol=1e-5)
