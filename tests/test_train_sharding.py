"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
training step must compile, run, and produce finite loss; the mesh helpers
must place batches correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rm_radar_tpu.models.yolov8 import create_model, init_params
from rm_radar_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    replicate,
    shard_batch,
)
from rm_radar_tpu.train.loss import DetectionTargets, detection_loss
from rm_radar_tpu.train.train_step import (
    create_train_state,
    make_sharded_train_step,
)


def test_mesh_shapes():
    mesh = make_mesh(n_data=8)
    assert mesh.shape[DATA_AXIS] == 8
    x = jnp.zeros((8, 4, 4))
    placed = shard_batch(mesh, x)
    assert placed.sharding.spec[0] == DATA_AXIS


def test_detection_loss_finite():
    model, cfg = create_model(variant="n", num_classes=3, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    raw = model.apply(variables, x, method="raw")
    targets = DetectionTargets(
        xywh=jnp.tile(jnp.asarray([[10.0, 10.0, 20.0, 20.0]]), (2, 3, 1)),
        label=jnp.zeros((2, 3), jnp.int32),
        valid=jnp.asarray([[True, True, False], [True, False, False]]),
    )
    loss, metrics = detection_loss(raw, targets, cfg)
    assert np.isfinite(float(loss))
    assert float(metrics["num_positive"]) > 0


@pytest.mark.slow
def test_sharded_train_step_runs_and_descends():
    mesh = make_mesh(n_data=8)
    model, cfg = create_model(variant="n", num_classes=3, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3)
    state = create_train_state(model, variables, tx)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(8, 64, 64, 3)).astype(np.float32))
    targets = DetectionTargets(
        xywh=jnp.tile(jnp.asarray([[8.0, 8.0, 30.0, 30.0]]), (8, 2, 1)),
        label=jnp.zeros((8, 2), jnp.int32),
        valid=jnp.ones((8, 2), bool),
    )

    with mesh:
        state = replicate(mesh, state)
        images_s = shard_batch(mesh, images)
        targets_s = shard_batch(mesh, targets)
        step = make_sharded_train_step(model, tx, mesh)
        losses = []
        for _ in range(3):
            state, metrics = step(state, images_s, targets_s)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # overfits the fixed batch
    assert int(state.step) == 3


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
