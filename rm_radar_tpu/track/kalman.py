"""Kalman filter / extended Kalman filter as pure functions.

The reference implements KF/EKF as templated C++ classes over fixed-size
Eigen matrices (src/track/kalman_filter.h:79-296). The TPU-native design is
functional: filter state is a ``(state, covariance)`` pair of arrays, and
predict/update are pure functions that jit, vmap (for a batched track store)
and differentiate for free.

Verified against the same filterpy golden values as the reference tests
(test/track/kf_test.cpp:43-81, test/track/ekf_test.cpp:68-113).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import Array

# Filter algebra is tiny (9x9); force full f32 precision on TPU.
_HI = jax.lax.Precision.HIGHEST


class GaussianState(NamedTuple):
    """Filter state: mean [S] and covariance [S, S] (leading batch dims ok)."""

    mean: Array
    cov: Array


def kf_predict(
    gs: GaussianState, transition: Array, process_noise: Array
) -> GaussianState:
    """Linear predict step.

    x' = F x;  P' = F P F^T + Q   (reference kalman_filter.h:111-116).
    Supports leading batch dimensions on every operand.
    """
    mean = jnp.einsum("...ij,...j->...i", transition, gs.mean, precision=_HI)
    cov = (
        jnp.einsum("...ij,...jk,...lk->...il", transition, gs.cov, transition, precision=_HI)
        + process_noise
    )
    return GaussianState(mean, cov)


def kf_update(
    gs: GaussianState,
    measurement: Array,
    observation: Array,
    observation_noise: Array,
    predicted_measurement: Array | None = None,
) -> GaussianState:
    """Measurement update step.

    y = z - H x;  S = H P H^T + R;  K = P H^T S^-1;
    x' = x + K y;  P' = (I - K H) P   (reference kalman_filter.h:124-146).

    ``predicted_measurement`` overrides ``H x`` for the EKF path, where the
    observation function supplies both the predicted measurement and its
    Jacobian (reference kalman_filter.h:235-240, 273-293).
    """
    if predicted_measurement is None:
        predicted_measurement = jnp.einsum("...ij,...j->...i", observation, gs.mean, precision=_HI)
    residual = measurement - predicted_measurement
    pht = jnp.einsum("...ij,...kj->...ik", gs.cov, observation, precision=_HI)
    innovation = (
        jnp.einsum("...ij,...jk->...ik", observation, pht, precision=_HI)
        + observation_noise
    )
    gain = jnp.einsum(
        "...ij,...jk->...ik", pht, jnp.linalg.inv(innovation), precision=_HI
    )
    mean = gs.mean + jnp.einsum("...ij,...j->...i", gain, residual, precision=_HI)
    s = gs.mean.shape[-1]
    identity = jnp.eye(s, dtype=gs.cov.dtype)
    cov = jnp.einsum(
        "...ij,...jk->...ik",
        identity - jnp.einsum("...ij,...jk->...ik", gain, observation, precision=_HI),
        gs.cov,
        precision=_HI,
    )
    return GaussianState(mean, cov)


def ekf_predict(
    gs: GaussianState, transition_jacobian: Array, process_noise: Array
) -> GaussianState:
    """EKF predict with a precomputed transition Jacobian.

    The reference EKF's transition callback returns the Jacobian which is also
    used to propagate the mean (kalman_filter.h:213-224) — i.e. the model is
    locally linear — so the step is identical to the linear predict.
    """
    return kf_predict(gs, transition_jacobian, process_noise)


def ekf_update(
    gs: GaussianState,
    measurement: Array,
    predicted_measurement: Array,
    observation_jacobian: Array,
    observation_noise: Array,
) -> GaussianState:
    """EKF update with precomputed h(x) and its Jacobian H."""
    return kf_update(
        gs,
        measurement,
        observation_jacobian,
        observation_noise,
        predicted_measurement=predicted_measurement,
    )
