"""Singer maneuvering-target model for the tracking EKF.

State is [x, vx, ax, y, vy, ay, z, vz, az] (9), measurement is [x, y, z] (3),
exactly as the reference (src/track/singer.h:20-21, 33-132). The transition
models acceleration as an exponentially-correlated random process with time
constant tau; the process noise is the reference's simplified form scaled by
max_acceleration^2 (singer.h:102-119 — note it deliberately uses a simplified
Q, not the full Singer Q; we reproduce it exactly for output parity).

All functions take/return plain arrays and broadcast over leading batch
dimensions, so a fleet of tracks is one vmap/stack away.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array
from .kalman import GaussianState, ekf_predict, ekf_update

STATE_SIZE = 9
MEASUREMENT_SIZE = 3


def singer_transition(dt: Array, tau: float) -> Array:
    """Transition matrix F(dt): per-axis blocks
    [[1, dt, dt^2/2], [0, 1, dt], [0, 0, exp(-dt/tau)]].

    NOTE the reference (singer.h:88-101) writes the dt and dt^2/2 terms at
    (3i, 3i+1) and (3i, 3i+2) but the velocity coupling at (3i+1, 3i+2);
    this is the standard nearly-constant-acceleration block and we build the
    same matrix.
    """
    dt = jnp.asarray(dt, jnp.float32)
    decay = jnp.exp(-dt / tau)
    block = jnp.stack(
        [
            jnp.stack([jnp.ones_like(dt), dt, dt * dt / 2.0], axis=-1),
            jnp.stack([jnp.zeros_like(dt), jnp.ones_like(dt), dt], axis=-1),
            jnp.stack([jnp.zeros_like(dt), jnp.zeros_like(dt), decay], axis=-1),
        ],
        axis=-2,
    )
    eye3 = jnp.eye(3, dtype=jnp.float32)
    # Block-diagonal over the three spatial axes: kron(I3, block).
    out = jnp.einsum("ij,...kl->...ikjl", eye3, block)
    return out.reshape(out.shape[:-4] + (STATE_SIZE, STATE_SIZE))


def singer_process_noise(dt: Array, tau: float, max_acceleration: float) -> Array:
    """Simplified Singer process noise Q(dt) * max_a^2.

    Mirrors reference singer.h:102-119 element by element: per-axis block
    [[dt^3/3,  dt^2/2,        dt/2     ],
     [dt^2/2,  dt,            1-e^{-dt/tau}],
     [dt/2,    1-e^{-dt/tau}, (1-e^{-2dt/tau})/2]] * max_a^2.
    """
    dt = jnp.asarray(dt, jnp.float32)
    e1 = 1.0 - jnp.exp(-dt / tau)
    e2 = (1.0 - jnp.exp(-2.0 * dt / tau)) / 2.0
    block = jnp.stack(
        [
            jnp.stack([dt**3 / 3.0, dt**2 / 2.0, dt / 2.0], axis=-1),
            jnp.stack([dt**2 / 2.0, dt, e1], axis=-1),
            jnp.stack([dt / 2.0, e1, e2], axis=-1),
        ],
        axis=-2,
    )
    eye3 = jnp.eye(3, dtype=jnp.float32)
    out = jnp.einsum("ij,...kl->...ikjl", eye3, block) * (max_acceleration**2)
    return out.reshape(out.shape[:-4] + (STATE_SIZE, STATE_SIZE))


def observation_matrix() -> Array:
    """H: picks x, y, z out of the state (reference singer.h:120-131)."""
    h = jnp.zeros((MEASUREMENT_SIZE, STATE_SIZE), jnp.float32)
    return h.at[jnp.arange(3), jnp.arange(3) * 3].set(1.0)


def initial_state(location: Array) -> GaussianState:
    """Track-birth state: [x,0,0,y,0,0,z,0,0], covariance 0.1 * I.

    Mirrors the reference Track constructor (src/track/track.h:61-66).
    ``location`` is [..., 3] in meters.
    """
    batch = location.shape[:-1]
    mean = jnp.zeros(batch + (STATE_SIZE,), jnp.float32)
    mean = mean.at[..., 0::3].set(location)
    cov = jnp.broadcast_to(
        jnp.eye(STATE_SIZE, dtype=jnp.float32) * 0.1,
        batch + (STATE_SIZE, STATE_SIZE),
    )
    return GaussianState(mean, cov)


def predict(
    gs: GaussianState, dt: Array, tau: float, max_acceleration: float
) -> GaussianState:
    """Singer-EKF predict (reference singer.h:61-63)."""
    return ekf_predict(
        gs,
        singer_transition(dt, tau),
        singer_process_noise(dt, tau, max_acceleration),
    )


def update(
    gs: GaussianState, measurement: Array, observation_noise: Array
) -> GaussianState:
    """Singer-EKF update with measurement [..., 3] (reference singer.h:70-73).

    ``observation_noise`` is the diagonal [3, 3] matrix built from the
    per-axis lidar noise (reference track.h:67-70).
    """
    h = observation_matrix()
    predicted = gs.mean[..., 0::3]
    return ekf_update(gs, measurement, predicted, h, observation_noise)


def location(gs: GaussianState) -> Array:
    """Track location = state[(0, 3, 6)] (reference track.h:167-170)."""
    return gs.mean[..., 0::3]
