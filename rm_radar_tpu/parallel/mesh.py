"""Device-mesh utilities: multi-camera scale-out over ICI.

The reference is strictly single-GPU (cudaSetDevice(0), detector.cpp:61); its
only concurrency is per-image CUDA streams. The TPU-native scale axis is the
camera/frame batch: shard it over a 1-D ``data`` mesh with NamedSharding and
let XLA place per-camera pipelines on separate chips — no NCCL, no streams,
just sharded jit. The second ``model`` axis carries output-channel tensor
parallelism for the training step (train.train_step.shard_train_state /
make_sharded_train_step(model_parallel=True)) — for detector variants too
large to replicate per chip; exercised by the driver dryrun on a
(data, model) mesh and equivalence-tested on the CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch/camera) axis over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batched arrays with the batch axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )
