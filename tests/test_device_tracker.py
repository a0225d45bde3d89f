"""Device tracker vs host tracker equivalence on randomized scenarios.

The batched on-device tracker must reproduce the host tracker (which mirrors
the reference CPU tracker) exactly: same track ids, states, labels and
locations (to f32 tolerance) across multi-frame sequences with births,
misses, deletions and label noise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rm_radar_tpu.configs import TrackerConfig
from rm_radar_tpu.track import device_tracker as dt
from rm_radar_tpu.track.tracker import RobotObservation, Tracker
from rm_radar_tpu.types import RobotBatch, TrackState

CFG = TrackerConfig(class_num=4, max_tracks=12)
R_CAP = 6


def _make_batch(observations):
    """List of (located, detected, label, conf, location) -> RobotBatch."""
    batch = RobotBatch.empty(R_CAP, 2)
    rect = np.zeros((R_CAP, 4), np.float32)
    label = np.full(R_CAP, -1, np.int32)
    conf = np.zeros(R_CAP, np.float32)
    detected = np.zeros(R_CAP, bool)
    valid = np.zeros(R_CAP, bool)
    a_lab = np.full((R_CAP, 2), -1, np.int32)
    a_conf = np.zeros((R_CAP, 2), np.float32)
    a_valid = np.zeros((R_CAP, 2), bool)
    loc = np.full((R_CAP, 3), np.nan, np.float32)
    located = np.zeros(R_CAP, bool)
    for i, (is_loc, is_det, lab, cf, location) in enumerate(observations):
        valid[i] = True
        rect[i] = [10.0 * i, 5.0, 8.0, 8.0]
        if is_det:
            detected[i] = True
            label[i] = lab
            conf[i] = cf
            a_lab[i, 0] = lab
            a_conf[i, 0] = cf
            a_valid[i, 0] = True
        if is_loc:
            located[i] = True
            loc[i] = location
    return batch._replace(
        rect=jnp.asarray(rect),
        label=jnp.asarray(label),
        confidence=jnp.asarray(conf),
        detected=jnp.asarray(detected),
        valid=jnp.asarray(valid),
        armor_label=jnp.asarray(a_lab),
        armor_conf=jnp.asarray(a_conf),
        armor_valid=jnp.asarray(a_valid),
        location=jnp.asarray(loc),
        located=jnp.asarray(located),
    )


def _make_host_obs(observations):
    out = []
    for is_loc, is_det, lab, cf, location in observations:
        feat = np.zeros(CFG.class_num, np.float32)
        if is_det:
            feat[lab] = 1.0  # L1-normalized single armor
        out.append(
            RobotObservation(
                detected=is_det,
                located=is_loc,
                label=lab if is_det else None,
                feature=feat,
                location=np.asarray(location, np.float32) if is_loc else None,
            )
        )
    return out


def _host_summary(tracker):
    return {
        t.track_id: (
            int(t.state),
            t.label(),
            np.round(t.location(), 3),
            t.init_count,
            t.miss_count,
        )
        for t in tracker.tracks
    }


def _device_summary(store):
    out = {}
    state = np.asarray(store.state)
    ids = np.asarray(store.track_id)
    labels = np.asarray(store.label())
    locs = np.asarray(store.location())
    init_c = np.asarray(store.init_count)
    miss_c = np.asarray(store.miss_count)
    for i in range(store.capacity):
        if state[i] >= 0:
            out[int(ids[i])] = (
                int(state[i]),
                int(labels[i]),
                np.round(locs[i], 3),
                int(init_c[i]),
                int(miss_c[i]),
            )
    return out


def _compare(host, device):
    assert set(host) == set(device), (host.keys(), device.keys())
    for tid in host:
        hs, hl, hloc, hic, hmc = host[tid]
        ds, dl, dloc, dic, dmc = device[tid]
        assert hs == ds, (tid, host[tid], device[tid])
        assert hl == dl, (tid, host[tid], device[tid])
        np.testing.assert_allclose(hloc, dloc, atol=2e-3, err_msg=str(tid))
        assert hic == dic and hmc == dmc, (tid, host[tid], device[tid])


def _run_scenario(frames):
    host = Tracker(CFG)
    store = dt.make_store(CFG)
    import jax

    step = jax.jit(lambda s, b, t: dt.update(s, b, t, CFG))
    for ts, observations in frames:
        host.update(_make_host_obs(observations), ts)
        store, out = step(store, _make_batch(observations), ts)
        _compare(_host_summary(host), _device_summary(store))
    return host, store


def test_single_target_lifecycle():
    target = lambda t: (True, True, 1, 0.9, [1.0 + 0.1 * t, 2.0, 0.0])
    frames = [(0.1 * t, [target(t)]) for t in range(8)]
    # then misses until deletion
    frames += [(0.8 + 0.1 * t, []) for t in range(CFG.miss_thresh + 1)]
    _run_scenario(frames)


def test_multi_target_with_noise():
    rng = np.random.default_rng(5)
    paths = [
        lambda t: [0.0 + 0.05 * t, 0.0, 0.0],
        lambda t: [5.0, 5.0 - 0.05 * t, 0.0],
        lambda t: [-3.0, 1.0, 0.5],
    ]
    frames = []
    for t in range(12):
        obs = []
        for k, path in enumerate(paths):
            if t > 3 and k == 2 and t % 3 == 0:
                continue  # dropouts for target 2
            p = np.asarray(path(t)) + rng.normal(0, 0.02, 3)
            obs.append((True, True, k, 0.8 + 0.05 * k, p.tolist()))
        if t == 5:
            obs.append((True, False, None, 0.0, [9.0, 9.0, 0.0]))  # located-only
        if t == 6:
            obs.append((False, True, 3, 0.7, [0, 0, 0]))  # detected-only
        frames.append((0.1 * t, obs))
    _run_scenario(frames)


def test_undetected_robot_inherits_track_label():
    # Confirm a track, then send a located-but-undetected robot at the same
    # spot: setTrack must fill its label from the track.
    frames = [
        (0.1 * t, [(True, True, 2, 0.9, [1.0, 1.0, 0.0])]) for t in range(6)
    ]
    host = Tracker(CFG)
    store = dt.make_store(CFG)
    import jax

    step = jax.jit(lambda s, b, t: dt.update(s, b, t, CFG))
    for ts, obs in frames:
        host.update(_make_host_obs(obs), ts)
        store, out = step(store, _make_batch(obs), ts)

    obs = [(True, False, None, 0.0, [1.0, 1.0, 0.0])]
    hobs = _make_host_obs(obs)
    host.update(hobs, 0.7)
    store, out_batch = step(store, _make_batch(obs), 0.7)
    assert hobs[0].label == 2
    assert int(np.asarray(out_batch.label)[0]) == 2
    assert int(np.asarray(out_batch.track_state)[0]) == int(TrackState.CONFIRMED)
    np.testing.assert_allclose(
        np.asarray(out_batch.location)[0], hobs[0].location, atol=2e-3
    )
