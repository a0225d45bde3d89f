"""Batched on-device tracker: the SORT lifecycle as one jittable update.

The host tracker (track/tracker.py) mirrors the reference's CPU design and
is the default — track counts are tiny and the lifecycle branch-heavy. This
module provides the same semantics as a fixed-capacity masked computation so
the tracker can live *inside* the fused device program: useful for the
multi-camera batch path (vmap over cameras tracks all streams in one
program) and for keeping the whole frame loop on-device.

Semantics follow reference src/track/tracker.cpp exactly (same value matrix,
auction, gate, lifecycle thresholds, spawn rule); equivalence against the
host tracker is asserted in tests/test_device_tracker.py on randomized
scenarios. Feature history is kept as running per-class sums — the
reference's Features only ever consumes row sums (features.h:176-197).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import TrackerConfig
from ..types import Array, RobotBatch, TrackState
from .auction import auction_jax
from .kalman import GaussianState
from .singer import STATE_SIZE, predict as singer_predict, update as singer_update


class TrackStore(NamedTuple):
    """Fixed-capacity track table (capacity T = config.max_tracks)."""

    mean: Array  # [T, 9]
    cov: Array  # [T, 9, 9]
    feat_sums: Array  # [T, C] running class-confidence sums
    timestamp: Array  # [T] float32 seconds
    track_id: Array  # [T] int32, -1 when slot free
    state: Array  # [T] int32 TrackState (NONE = free slot)
    init_count: Array  # [T] int32
    miss_count: Array  # [T] int32
    next_id: Array  # [] int32

    @property
    def capacity(self) -> int:
        return self.mean.shape[0]

    def alive(self) -> Array:
        return self.state >= 0

    def location(self) -> Array:
        return self.mean[:, 0::3]

    def label(self) -> Array:
        return jnp.argmax(self.feat_sums, axis=-1).astype(jnp.int32)

    def feature(self) -> Array:
        total = jnp.sum(self.feat_sums, axis=-1, keepdims=True)
        return jnp.where(total > 0, self.feat_sums / jnp.where(total > 0, total, 1.0), 0.0)

    def summary(self) -> str:
        """JSON-ish dump of the live tracks, mirroring the reference's
        ``operator<<(std::ostream&, const Track&)``
        (src/track/track.h:172-185): id, state, label, location, counters."""
        import jax
        import numpy as np

        s = jax.device_get(self)
        if np.ndim(s.state) != 1:
            return (
                f"TrackStore(batch={s.state.shape[:-1]}, "
                f"capacity={s.state.shape[-1]}, "
                f"alive={(s.state >= 0).sum(axis=-1).tolist()})"
            )
        names = {s_.value: s_.name.lower() for s_ in TrackState}
        loc = s.mean[:, 0::3]
        label = np.argmax(s.feat_sums, axis=-1)
        rows = [
            '{"id": %d, "state": "%s", "label": %d, '
            '"location": [%.2f, %.2f, %.2f], "init": %d, "miss": %d}'
            % (
                int(s.track_id[i]),
                names[int(s.state[i])],
                int(label[i]),
                loc[i, 0],
                loc[i, 1],
                loc[i, 2],
                int(s.init_count[i]),
                int(s.miss_count[i]),
            )
            for i in range(s.state.shape[0])
            if s.state[i] >= 0
        ]
        return (
            f"TrackStore({len(rows)}/{s.state.shape[0]} live, "
            f"next_id={int(s.next_id)}: [" + ", ".join(rows) + "])"
        )

    def __repr__(self) -> str:
        try:
            return self.summary()
        except Exception:
            return f"TrackStore(capacity={self.mean.shape[0]})"


def make_store(config: TrackerConfig) -> TrackStore:
    t, c = config.max_tracks, config.class_num
    return TrackStore(
        mean=jnp.zeros((t, STATE_SIZE), jnp.float32),
        cov=jnp.zeros((t, STATE_SIZE, STATE_SIZE), jnp.float32),
        feat_sums=jnp.zeros((t, c), jnp.float32),
        timestamp=jnp.zeros((t,), jnp.float32),
        track_id=jnp.full((t,), -1, jnp.int32),
        state=jnp.full((t,), int(TrackState.NONE), jnp.int32),
        init_count=jnp.zeros((t,), jnp.int32),
        miss_count=jnp.zeros((t,), jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
    )


def _scores(store: TrackStore, robots: RobotBatch, feats: Array, config: TrackerConfig) -> Array:
    """Value matrix [R, T] (reference tracker.cpp:85-118)."""
    loc_r = robots.location  # [R, 3] (NaN when not located)
    loc_t = store.location()  # [T, 3]
    d = jnp.linalg.norm(
        jnp.where(robots.located[:, None], loc_r, 0.0)[:, None, :] - loc_t[None, :, :],
        axis=-1,
    )
    dt_ = config.distance_thresh
    distance_score = jnp.where(
        d < dt_, 1.0, jnp.where(d < 2 * dt_, -d / dt_ + 2.0, 0.0)
    )
    distance_score = jnp.where(robots.located[:, None], distance_score, 0.0)

    ft = store.feature()  # [T, C]
    denom = jnp.linalg.norm(feats, axis=-1)[:, None] * jnp.linalg.norm(ft, axis=-1)[None, :]
    cos = jnp.einsum("rc,tc->rt", feats, ft) / jnp.where(denom > 0, denom, 1.0)
    feature_score = jnp.where(denom > 0, (cos + 1.0) / 2.0, 0.0)

    value = (
        distance_score * config.distance_weight
        + feature_score * config.feature_weight
    )
    # Robots that are neither located nor detected score 0 (tracker.cpp:86-88).
    value = jnp.where(
        (robots.located | robots.detected)[:, None], value, 0.0
    )
    return value


def update(
    store: TrackStore,
    robots: RobotBatch,
    timestamp: Array,
    config: TrackerConfig,
) -> Tuple[TrackStore, RobotBatch]:
    """One tracking step (reference tracker.cpp:126-220), fully jittable.

    Returns the new store and the robots with setTrack applied
    (label/location overridden per robot.cpp:81-94; track_state filled).
    """
    cfg = config
    alive = store.alive()
    ts = jnp.asarray(timestamp, jnp.float32)

    # --- predict all live tracks to the frame timestamp
    dt = jnp.where(alive, ts - store.timestamp, 0.0)
    gs = GaussianState(store.mean, store.cov)
    gs_pred = singer_predict(
        gs, dt, cfg.acceleration_correlation_time, cfg.max_acceleration
    )
    mean = jnp.where(alive[:, None], gs_pred.mean, store.mean)
    cov = jnp.where(alive[:, None, None], gs_pred.cov, store.cov)
    store = store._replace(
        mean=mean, cov=cov, timestamp=jnp.where(alive, ts, store.timestamp)
    )

    feats = robots.feature(cfg.class_num)  # [R, C]
    value = _scores(store, robots, feats, cfg)
    # task_key = track id: the host tracker's track list is in insertion
    # order (spawn appends, deletion compacts preserving order), and ids
    # ascend per spawn — so ordering columns by id reproduces the reference
    # value-matrix layout exactly even when this store has interior holes,
    # keeping first-max tie-breaking identical (auction.h:55-61).
    assignment = auction_jax(
        value,
        cfg.max_iter,
        valid_agents=robots.valid,
        valid_tasks=alive,
        task_key=store.track_id,
    )  # [R] -> track slot or -1

    # --- gate (tracker.cpp:165-170): located robots only; reject when far
    # AND label differs.
    t_safe = jnp.clip(assignment, 0, store.capacity - 1)
    d_match = jnp.linalg.norm(
        jnp.where(robots.located[:, None], robots.location, 0.0)
        - store.location()[t_safe],
        axis=-1,
    )
    track_label = store.label()[t_safe]
    robot_label = jnp.where(robots.detected, robots.label, -1)
    gate_ok = ~(
        (d_match > 2 * cfg.distance_thresh) & (robot_label != track_label)
    )
    matched = (assignment >= 0) & robots.located & gate_ok & robots.valid

    # --- measurement update for matched tracks (scatter by track slot)
    r_of_t = jnp.full((store.capacity,), -1, jnp.int32)
    r_idx = jnp.arange(robots.valid.shape[0], dtype=jnp.int32)
    r_of_t = r_of_t.at[jnp.where(matched, assignment, store.capacity)].set(
        r_idx, mode="drop"
    )
    track_matched = r_of_t >= 0
    r_safe = jnp.clip(r_of_t, 0, r_idx.shape[0] - 1)

    obs_noise = jnp.diag(jnp.asarray(cfg.observation_noise, jnp.float32))
    z = robots.location[r_safe]
    z = jnp.where(track_matched[:, None], z, 0.0)
    gs_upd = singer_update(GaussianState(store.mean, store.cov), z, obs_noise)
    mean = jnp.where(track_matched[:, None], gs_upd.mean, store.mean)
    cov = jnp.where(track_matched[:, None, None], gs_upd.cov, store.cov)
    feat_sums = jnp.where(
        track_matched[:, None],
        store.feat_sums + feats[r_safe],
        store.feat_sums,
    )

    # --- lifecycle (tracker.cpp:174-207)
    is_tent = store.state == int(TrackState.TENTATIVE)
    is_conf = store.state == int(TrackState.CONFIRMED)
    init_count = jnp.where(
        track_matched & is_tent, store.init_count + 1, store.init_count
    )
    promote = track_matched & is_tent & (init_count >= cfg.init_thresh)
    miss_count = jnp.where(track_matched, 0, store.miss_count)
    miss_count = jnp.where(~track_matched & is_conf, miss_count + 1, miss_count)
    deleted = (~track_matched & is_tent) | (
        ~track_matched & is_conf & (miss_count >= cfg.miss_thresh)
    )
    state = store.state
    state = jnp.where(promote, int(TrackState.CONFIRMED), state)
    state = jnp.where(deleted & alive, int(TrackState.NONE), state)

    store = store._replace(
        mean=mean,
        cov=cov,
        feat_sums=jnp.where(deleted[:, None], 0.0, feat_sums),
        init_count=jnp.where(deleted, 0, init_count),
        miss_count=jnp.where(deleted, 0, miss_count),
        state=state,
        track_id=jnp.where(deleted, -1, store.track_id),
    )

    # --- setTrack on matched robots BEFORE spawning (robot.cpp:81-94):
    # confirmed tracks overwrite label+location; tentative fill missing.
    t_state = store.state[t_safe]
    t_confirmed = matched & (t_state == int(TrackState.CONFIRMED))
    t_label = store.label()[t_safe]
    t_loc = store.location()[t_safe]
    new_label = jnp.where(
        t_confirmed | (matched & ~robots.detected), t_label, robots.label
    )
    new_loc = jnp.where(
        (t_confirmed | (matched & ~robots.located))[:, None],
        t_loc,
        robots.location,
    )
    new_located = robots.located | matched
    track_state_out = jnp.where(matched, t_state, int(TrackState.NONE))

    # --- spawn new tracks from unmatched detected+located robots
    # (tracker.cpp:210-219) into free slots, in robot index order.
    spawner = robots.valid & ~matched & robots.detected & robots.located
    free = store.state == int(TrackState.NONE)
    spawn_rank = jnp.cumsum(spawner.astype(jnp.int32)) - 1  # [R]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # [T]
    # slot_of_rank[k] = k-th free slot index
    t_idx = jnp.arange(store.capacity, dtype=jnp.int32)
    slot_of_rank = jnp.full((store.capacity,), store.capacity, jnp.int32)
    slot_of_rank = slot_of_rank.at[
        jnp.where(free, free_rank, store.capacity)
    ].set(t_idx, mode="drop")
    n_free = jnp.sum(free.astype(jnp.int32))
    can_spawn = spawner & (spawn_rank < n_free)
    target = jnp.where(
        can_spawn,
        slot_of_rank[jnp.clip(spawn_rank, 0, store.capacity - 1)],
        store.capacity,
    )

    # Scatter robot birth state into the free slots.
    init_mean = jnp.zeros((robots.valid.shape[0], STATE_SIZE), jnp.float32)
    init_mean = init_mean.at[:, 0::3].set(
        jnp.where(can_spawn[:, None], robots.location, 0.0)
    )
    init_cov = jnp.eye(STATE_SIZE, dtype=jnp.float32) * 0.1

    store = store._replace(
        mean=store.mean.at[target].set(init_mean, mode="drop"),
        cov=store.cov.at[target].set(
            jnp.broadcast_to(init_cov, (robots.valid.shape[0],) + init_cov.shape),
            mode="drop",
        ),
        feat_sums=store.feat_sums.at[target].set(
            jnp.where(can_spawn[:, None], feats, 0.0), mode="drop"
        ),
        timestamp=store.timestamp.at[target].set(ts, mode="drop"),
        track_id=store.track_id.at[target].set(
            store.next_id + spawn_rank, mode="drop"
        ),
        state=store.state.at[target].set(
            int(TrackState.TENTATIVE), mode="drop"
        ),
        init_count=store.init_count.at[target].set(0, mode="drop"),
        miss_count=store.miss_count.at[target].set(0, mode="drop"),
        next_id=store.next_id + jnp.sum(can_spawn.astype(jnp.int32)),
    )

    # Spawned robots get the tentative setTrack treatment (fill missing).
    track_state_out = jnp.where(
        can_spawn, int(TrackState.TENTATIVE), track_state_out
    )

    robots = robots._replace(
        label=jnp.where(robots.valid, new_label, robots.label),
        location=jnp.where(robots.valid[:, None], new_loc, robots.location),
        located=jnp.where(robots.valid, new_located, robots.located),
        track_state=jnp.where(robots.valid, track_state_out, robots.track_state),
    )
    return store, robots
