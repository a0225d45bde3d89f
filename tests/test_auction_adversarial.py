"""Adversarial auction equivalence: exact score ties, interior free slots
(holes), full stores, agents > tasks — the cases where column ORDER decides
the result (first-max tie-breaking, reference auction.h:49-127).

The host `auction` is the bit-faithful reference implementation; `auction_jax`
runs over a fixed-capacity store whose live tasks may sit at arbitrary slots.
With ``task_key`` (insertion order), the device result must equal the host
result computed on the id-ordered compacted matrix — the exact layout the
reference tracker builds (tracker.cpp:134-144)."""

import numpy as np
import pytest

from rm_radar_tpu.track.auction import NOT_MATCHED, auction, auction_jax


def host_reference(value_full, valid_agents, valid_tasks, ids, max_iter=100):
    """What the reference produces: rows = valid agents in index order,
    columns = valid tasks in insertion (id) order; result mapped back to
    capacity slot indices."""
    rows = np.nonzero(valid_agents)[0]
    live = np.nonzero(valid_tasks)[0]
    cols = live[np.argsort(ids[live], kind="stable")]
    if len(rows) == 0:
        return np.full(value_full.shape[0], NOT_MATCHED)
    sub = value_full[np.ix_(rows, cols)]
    if sub.shape[1] == 0:
        a = np.full(len(rows), NOT_MATCHED)
    else:
        a = auction(sub, max_iter)
    out = np.full(value_full.shape[0], NOT_MATCHED, np.int64)
    for r, t in zip(rows, a):
        out[r] = cols[t] if t >= 0 else NOT_MATCHED
    return out


def run_device(value_full, valid_agents, valid_tasks, ids, max_iter=100):
    import jax

    fn = jax.jit(
        lambda v, va, vt, k: auction_jax(
            v, max_iter, valid_agents=va, valid_tasks=vt, task_key=k
        )
    )
    return np.asarray(
        fn(
            value_full.astype(np.float32),
            valid_agents,
            valid_tasks,
            ids.astype(np.float32),
        )
    )


def test_tie_broken_by_insertion_order_not_slot_order():
    """Two tracks with EQUAL value; the younger one sits at a LOWER slot
    (spawned into a hole). The reference assigns the first robot to the
    OLDER track (first column)."""
    t_cap = 4
    valid_tasks = np.array([True, True, False, False])
    ids = np.array([7, 2, -1, -1])  # slot 0 holds the younger track (id 7)
    value = np.zeros((1, t_cap), np.float32)
    value[0, 0] = 0.5  # exact tie
    value[0, 1] = 0.5
    valid_agents = np.array([True])
    want = host_reference(value, valid_agents, valid_tasks, ids)
    got = run_device(value, valid_agents, valid_tasks, ids)
    assert want[0] == 1  # older track (id 2) at slot 1 wins the tie
    np.testing.assert_array_equal(got, want)


def test_virtual_tasks_sort_after_real_ones():
    """agents > tasks with the single real track at a HIGH slot: zero-value
    net ties between the real task and a virtual task must resolve to the
    real task (reference appends virtual columns last, auction.h:55-61)."""
    t_cap = 6
    valid_tasks = np.zeros(t_cap, bool)
    valid_tasks[4] = True
    ids = np.full(t_cap, -1)
    ids[4] = 0
    value = np.array(  # agent 0 ties real vs virtual; others prefer virtual
        [[0.0] * t_cap, [0.0] * t_cap, [0.0] * t_cap], np.float32
    )
    value[0, 4] = 0.0  # exact zero tie with the virtual tasks
    value[1, 4] = -0.1  # (virtual tasks are worth 0 to everyone)
    value[2, 4] = -0.1
    valid_agents = np.ones(3, bool)
    want = host_reference(value, valid_agents, valid_tasks, ids)
    got = run_device(value, valid_agents, valid_tasks, ids)
    # Agent 0's zero tie between the real task and a virtual one must break
    # toward the real task (it is the FIRST column in the reference layout).
    assert want[0] == 4
    np.testing.assert_array_equal(got, want)


def test_full_store_and_empty_store():
    rng = np.random.default_rng(0)
    # full store: every slot alive
    value = rng.choice([0.0, 0.25, 0.5, 1.0], size=(5, 8)).astype(np.float32)
    ids = rng.permutation(8)
    va = np.ones(5, bool)
    vt = np.ones(8, bool)
    np.testing.assert_array_equal(
        run_device(value, va, vt, ids), host_reference(value, va, vt, ids)
    )
    # empty store: no tasks at all
    vt0 = np.zeros(8, bool)
    got = run_device(value, va, vt0, ids)
    assert (got == NOT_MATCHED).all()


@pytest.mark.parametrize("seed", range(40))
def test_randomized_holes_and_ties(seed):
    """Quantized values (ties common), random holes, random id order,
    random invalid agents, agents both > and < tasks."""
    rng = np.random.default_rng(seed)
    a_cap = int(rng.integers(1, 7))
    t_cap = int(rng.integers(1, 9))
    value = rng.choice(
        [0.0, 0.2, 0.2, 0.5, 0.5, 0.9], size=(a_cap, t_cap)
    ).astype(np.float32)
    valid_agents = rng.random(a_cap) < 0.8
    valid_tasks = rng.random(t_cap) < 0.6
    ids = rng.permutation(100)[:t_cap]  # unique, arbitrary order
    want = host_reference(value, valid_agents, valid_tasks, ids)
    got = run_device(value, valid_agents, valid_tasks, ids)
    np.testing.assert_array_equal(got, want, err_msg=str((value, valid_agents, valid_tasks, ids)))
