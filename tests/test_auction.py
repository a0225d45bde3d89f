"""Auction algorithm tests, mirroring reference test/track/auction_test.cpp
(square, both rectangular orientations, zero iterations), plus equivalence of
the jit-compatible implementation with the host one.
"""

import numpy as np

from rm_radar_tpu.track.auction import NOT_MATCHED, auction, auction_jax


def test_square():
    value = np.arange(1.0, 10.0).reshape(3, 3)
    result = auction(value, 100)
    assert list(result) == [2, 1, 0]


def test_more_agents_than_tasks():
    value = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 4, 7]], np.float32)
    result = auction(value, 100)
    assert len(result) == 4
    for task in range(3):
        assert task in result
    # Exactly one agent won the virtual task.
    assert np.count_nonzero(result == NOT_MATCHED) == 1


def test_more_tasks_than_agents():
    value = np.arange(1.0, 13.0).reshape(3, 4)
    result = auction(value, 100)
    assert all(r != NOT_MATCHED for r in result)
    assert len(set(result)) == 3


def test_zero_iterations():
    value = np.arange(1.0, 10.0).reshape(3, 3)
    result = auction(value, 0)
    assert all(r == NOT_MATCHED for r in result)


def test_jax_matches_host_square():
    rng = np.random.default_rng(7)
    for _ in range(10):
        value = rng.uniform(0, 1, size=(5, 5)).astype(np.float32)
        host = auction(value, 100)
        dev = np.asarray(auction_jax(value, 100))
        np.testing.assert_array_equal(host, dev)


def test_jax_masked_matches_host_rect():
    rng = np.random.default_rng(11)
    for n_agents, n_tasks in [(4, 2), (2, 4), (6, 6), (3, 1)]:
        value = rng.uniform(0, 1, size=(n_agents, n_tasks)).astype(np.float32)
        host = auction(value, 100)
        # Embed into an 8x8 capacity with validity masks.
        cap = 8
        padded = np.zeros((cap, cap), np.float32)
        padded[:n_agents, :n_tasks] = value
        va = np.arange(cap) < n_agents
        vt = np.arange(cap) < n_tasks
        dev = np.asarray(auction_jax(padded, 100, va, vt))
        np.testing.assert_array_equal(host, dev[:n_agents])
        assert all(dev[n_agents:] == NOT_MATCHED)
