"""Training checkpoint/resume via orbax.

The inference side persists weights as flat ``.npz`` archives
(models/weights.py — the analogue of the reference's serialized-engine cache,
detector.cpp:177-311). Training needs more: optimizer state, step counter and
retention management so a long TPU-pod run can resume after preemption. This
module wraps ``orbax.checkpoint`` (the standard JAX checkpointing library,
async-save capable and pytree-sharding aware) around the TrainState pytree.

Usage:
    mgr = make_manager(dir, max_to_keep=3)
    save(mgr, step, state)                  # async; returns immediately
    state = restore_latest(mgr, state)      # template = abstract/concrete state
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def make_manager(directory: str, max_to_keep: int = 3):
    """A CheckpointManager writing StandardCheckpointer checkpoints."""
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save(mgr, step: int, state: Any, wait: bool = False) -> None:
    """Save ``state`` (any pytree) at ``step``; async unless ``wait``."""
    import orbax.checkpoint as ocp

    mgr.save(int(step), args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def latest_step(mgr) -> Optional[int]:
    return mgr.latest_step()


def restore_latest(mgr, template: Any) -> Optional[Any]:
    """Restore the newest checkpoint as the same pytree structure as
    ``template`` (pass the freshly-initialized TrainState; its array shapes,
    dtypes and shardings are reproduced). Returns None when the directory
    has no checkpoints yet."""
    import orbax.checkpoint as ocp

    step = mgr.latest_step()
    if step is None:
        return None
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, template
    )
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
