"""Sharded training step for the YOLOv8 detector.

Data-parallel over the ``data`` mesh axis (batch sharded, parameters
replicated); gradients are averaged by XLA-inserted collectives over ICI —
no NCCL/MPI anywhere, just sharded jit. The ``model`` axis is plumbed
through for channel-sharding large variants.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.yolov8 import YoloV8
from ..parallel.mesh import DATA_AXIS
from .loss import DetectionTargets, detection_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: YoloV8, variables: Any, tx: optax.GradientTransformation
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(
    state: TrainState,
    images: jnp.ndarray,
    targets: DetectionTargets,
    model: YoloV8,
    tx: optax.GradientTransformation,
    assigner: str = "center",
) -> Tuple[TrainState, dict]:
    """One SGD step: forward (train-mode BN), loss, grad, update.

    ``assigner`` selects the anchor-assignment scheme in the loss
    ("center" or "tal", see loss.detection_loss); it is a static string
    baked into the jitted program.
    """

    def loss_fn(params):
        raw, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            method=YoloV8.raw,
        )
        loss, metrics = detection_loss(
            raw, targets, model.cfg, assigner=assigner
        )
        return loss, (metrics, mutated["batch_stats"])

    (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        TrainState(params, new_bs, opt_state, state.step + 1),
        metrics,
    )


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """Exponential moving average of parameters (the Ultralytics trainer
    keeps an EMA model for evaluation/export; decay 0.999 is its default
    scale). Call after each optimizer step; evaluate/export the EMA tree."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


def make_sharded_train_step(
    model: YoloV8,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    assigner: str = "center",
):
    """jit the train step over a mesh: batch sharded on DATA_AXIS, state
    replicated. XLA inserts the gradient all-reduce over ICI."""
    repl = NamedSharding(mesh, P())
    batch_first = NamedSharding(mesh, P(DATA_AXIS))

    step = functools.partial(train_step, model=model, tx=tx, assigner=assigner)
    # Sharding prefixes: replicated state, batch-sharded images/targets.
    return jax.jit(
        step,
        in_shardings=(repl, batch_first, batch_first),
        donate_argnums=(0,),
    )
