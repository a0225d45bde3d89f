"""Auction algorithm for data association.

Reimplements the reference's simplified Bertsekas auction
(src/track/auction.h:49-127) with identical semantics:

* maximizes total *value* (the tracker builds a value matrix, not a cost
  matrix — see tracker.cpp:134-140),
* when there are more agents (robots) than tasks (tracks), virtual zero-value
  tasks pad the matrix to square; agents won on virtual tasks report -1,
* the bid increment is the full best net value (no epsilon scaling and no
  second-best margin — the reference's simplification), so agents can remain
  unassigned when max_iter is hit or when no assignment changes in a round.

Two implementations are provided:

* :func:`auction` — host-side numpy, bit-faithful to the reference loop,
  used by the host tracker (problem sizes are <= ~20x12, host is fastest).
* :func:`auction_jax` — a jit-compatible ``lax.while_loop`` formulation with
  identical results for the fused on-device pipeline.
"""

from __future__ import annotations

import numpy as np

NOT_MATCHED = -1


def auction(value_matrix: np.ndarray, max_iter: int = 100) -> np.ndarray:
    """Assign tasks (columns) to agents (rows), maximizing value.

    Returns int array [num_agents]; -1 for unassigned / virtual.
    """
    value_matrix = np.asarray(value_matrix, dtype=np.float32)
    num_agents, num_tasks = value_matrix.shape
    num_tasks_real = num_tasks

    if num_agents > num_tasks:
        padded = np.zeros((num_agents, num_agents), dtype=np.float32)
        padded[:, :num_tasks] = value_matrix
        value_matrix = padded
        num_tasks = num_agents

    prices = np.zeros(num_tasks, dtype=np.float32)
    assignment = np.full(num_agents, NOT_MATCHED, dtype=np.int64)

    for _ in range(max_iter):
        if np.count_nonzero(assignment >= 0) >= num_agents:
            break
        any_changed = False
        for agent in range(num_agents):
            if assignment[agent] != NOT_MATCHED:
                continue
            net = value_matrix[agent] - prices
            best_task = int(np.argmax(net))  # first max, like the ref loop
            best_value = float(net[best_task])
            prices[best_task] += best_value
            # Evict whoever currently holds the task.
            holders = np.nonzero(assignment == best_task)[0]
            if holders.size:
                assignment[holders[0]] = NOT_MATCHED
            assignment[agent] = best_task
            any_changed = True
        if not any_changed:
            break

    assignment[assignment >= num_tasks_real] = NOT_MATCHED
    return assignment


def auction_jax(
    value_matrix,
    max_iter: int = 100,
    valid_agents=None,
    valid_tasks=None,
    task_key=None,
):
    """jit-compatible auction over a fixed-capacity value matrix.

    ``value_matrix`` is [A, T] where A/T are static capacities;
    ``valid_agents`` / ``valid_tasks`` mask the live rows/columns (invalid
    tasks behave like the reference's virtual zero-value padding: they can be
    won but report -1). Returns int32 [A] assignment with -1 for unmatched
    or invalid agents.

    ``task_key``: optional float/int [T] sort key giving the *reference
    column order* of the valid tasks (e.g. track insertion order = ascending
    track id). The reference's value matrix has columns in track-list order
    with the virtual zero-value tasks appended AFTER them (auction.h:55-61),
    and the bid loop breaks score ties by first-max — so column order is
    semantically significant. A fixed-capacity store with interior free
    slots (the device tracker spawns into holes) would otherwise interleave
    virtual tasks among real ones and flip tie-breaks; the permutation below
    restores the exact reference layout: valid tasks sorted by ``task_key``
    first, then the free slots (of which the first agents-tasks act as
    virtual tasks). Without ``task_key``, valid tasks keep their slot order
    (exact when valid tasks form a prefix).
    """
    import jax
    import jax.numpy as jnp

    value_matrix = jnp.asarray(value_matrix, jnp.float32)
    num_agents, num_tasks = value_matrix.shape
    valid_agents = (
        jnp.ones((num_agents,), bool)
        if valid_agents is None
        else jnp.asarray(valid_agents, bool)
    )
    valid_tasks = (
        jnp.ones((num_tasks,), bool)
        if valid_tasks is None
        else jnp.asarray(valid_tasks, bool)
    )

    if task_key is not None:
        # Stable sort: valid tasks (by key) first, invalid slots after.
        key = jnp.where(
            valid_tasks, jnp.asarray(task_key, jnp.float32), jnp.inf
        )
        perm = jnp.argsort(key)  # jnp.argsort is stable
        value_matrix = value_matrix[:, perm]
        valid_tasks = valid_tasks[perm]
    else:
        perm = None

    # The reference pads with *exactly* max(0, agents - tasks) zero-value
    # virtual tasks (auction.h:55-61); exposing every invalid capacity slot as
    # a free zero-value task would change the bidding dynamics (an agent could
    # escape to a virtual task in cases where the reference forces it onto a
    # real one). After the permutation above (or with a naturally compact
    # store) valid tasks form a prefix; the first (n_agents - n_tasks)
    # invalid slots become virtual tasks, the rest are priced out with -inf.
    n_valid_agents = jnp.sum(valid_agents.astype(jnp.int32))
    n_valid_tasks = jnp.sum(valid_tasks.astype(jnp.int32))
    n_virtual = jnp.maximum(n_valid_agents - n_valid_tasks, 0)
    invalid_rank = jnp.cumsum(~valid_tasks) - 1  # rank among invalid slots
    is_virtual = (~valid_tasks) & (invalid_rank < n_virtual)
    values = jnp.where(
        valid_tasks[None, :],
        value_matrix,
        jnp.where(is_virtual[None, :], 0.0, -jnp.inf),
    )

    def agent_round(carry, agent):
        prices, assignment = carry
        unassigned = (assignment[agent] == NOT_MATCHED) & valid_agents[agent]
        net = values[agent] - prices
        best_task = jnp.argmax(net)
        best_value = net[best_task]
        new_prices = prices.at[best_task].add(best_value)
        # Evict the current holder (at most one agent holds a task).
        evicted = jnp.where(
            assignment == best_task, NOT_MATCHED, assignment
        )
        new_assignment = evicted.at[agent].set(best_task)
        prices = jnp.where(unassigned, new_prices, prices)
        assignment = jnp.where(unassigned, new_assignment, assignment)
        return (prices, assignment), unassigned

    def body(state):
        prices, assignment, _it, _changed = state
        (prices, assignment), did_bid = jax.lax.scan(
            agent_round, (prices, assignment), jnp.arange(num_agents)
        )
        return (prices, assignment, _it + 1, jnp.any(did_bid))

    def cond(state):
        _prices, assignment, it, changed = state
        n_assigned = jnp.sum((assignment >= 0) | ~valid_agents)
        return (it < max_iter) & (n_assigned < num_agents) & changed

    prices0 = jnp.zeros((num_tasks,), jnp.float32)
    assignment0 = jnp.full((num_agents,), NOT_MATCHED, jnp.int32)
    _, assignment, _, _ = jax.lax.while_loop(
        cond, body, (prices0, assignment0, jnp.int32(0), jnp.bool_(True))
    )
    # Virtual / invalid tasks and invalid agents report NOT_MATCHED.
    won_virtual = ~valid_tasks[jnp.clip(assignment, 0, num_tasks - 1)]
    assignment = jnp.where(
        (assignment >= 0) & (won_virtual | ~valid_agents), NOT_MATCHED, assignment
    )
    if perm is not None:  # map back to original slot indices
        assignment = jnp.where(
            assignment >= 0,
            perm[jnp.clip(assignment, 0, num_tasks - 1)].astype(jnp.int32),
            assignment,
        )
    return assignment
