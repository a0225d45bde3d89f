"""Sharded training step for the YOLOv8 detector.

Data-parallel over the ``data`` mesh axis (batch sharded, parameters
replicated); gradients are averaged by XLA-inserted collectives over ICI —
no NCCL/MPI anywhere, just sharded jit.

The ``model`` axis carries channel tensor-parallelism for variants too
large to replicate (yolov8l/x at big batch): :func:`shard_train_state`
places every conv kernel's output-channel dimension (and the matching
[C_out] bias/BN vectors and optimizer moments) over MODEL_AXIS, and the
jitted step inherits those shardings — XLA/GSPMD partitions each
convolution's output channels across the model axis and inserts the
all-gathers/psums over ICI. This is the functional capability (validated
on the CPU mesh + driver dryrun, exact vs the replicated step); tuning
the activation shardings for ICI bandwidth belongs on real multi-chip
hardware.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.yolov8 import YoloV8
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
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


def _model_leaf_sharding(mesh: Mesh, n_model: int):
    """Per-leaf NamedSharding rule for channel tensor-parallelism.

    Conv kernels are Flax-layout [kh, kw, c_in, c_out]: shard c_out over
    MODEL_AXIS when divisible (output-channel parallel convolution — the
    conv analogue of Megatron's column-parallel matmul); the matching
    [c_out] vectors (bias, BN scale/mean/var, Adam moments) shard on their
    single axis. Everything else (scalars, small heads with indivisible
    channels) stays replicated — GSPMD handles mixed placements.
    """

    def leaf(x):
        shape = getattr(x, "shape", ())
        if len(shape) == 4 and shape[-1] % n_model == 0 and shape[-1] >= (
            2 * n_model
        ):
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= (
            2 * n_model
        ):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return leaf


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh: replicated over DATA_AXIS, channel-
    sharded over MODEL_AXIS (no-op sharding-wise when the model axis is 1).
    Pass the result to the step from :func:`make_sharded_train_step`
    (``model_parallel=True``), which inherits these placements."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape))[MODEL_AXIS]
    leaf = _model_leaf_sharding(mesh, n_model)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), leaf(x)), state
    )


def make_sharded_train_step(
    model: YoloV8,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    assigner: str = "center",
    model_parallel: bool = False,
):
    """jit the train step over a mesh: batch sharded on DATA_AXIS, state
    replicated (default) — XLA inserts the gradient all-reduce over ICI.

    ``model_parallel=True``: the state argument's own placements are
    inherited instead of forcing replication — pass a state prepared by
    :func:`shard_train_state` to run output-channel tensor-parallel convs
    over MODEL_AXIS (for variants too large to replicate). Results are
    exact vs the replicated step up to f32 reduction-order rounding
    (tested on the CPU mesh, tests/test_train_sharding.py)."""
    repl = NamedSharding(mesh, P())
    batch_first = NamedSharding(mesh, P(DATA_AXIS))

    step = functools.partial(train_step, model=model, tx=tx, assigner=assigner)
    # Sharding prefixes: state (replicated, or inherited for tensor
    # parallelism), batch-sharded images/targets.
    return jax.jit(
        step,
        in_shardings=(None if model_parallel else repl, batch_first, batch_first),
        donate_argnums=(0,),
    )
