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


@pytest.mark.slow
def test_model_parallel_step_matches_replicated():
    """Channel tensor-parallelism over MODEL_AXIS (shard_train_state +
    model_parallel=True) must produce the same step as the replicated
    data-parallel step, up to f32 reduction-order rounding — the partitioned
    convolutions are a re-bracketing of the same math."""
    from rm_radar_tpu.parallel.mesh import MODEL_AXIS
    from rm_radar_tpu.train.train_step import shard_train_state

    model, cfg = create_model(variant="n", num_classes=3, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(size=(4, 64, 64, 3)).astype(np.float32))
    targets = DetectionTargets(
        xywh=jnp.tile(jnp.asarray([[8.0, 8.0, 30.0, 30.0]]), (4, 2, 1)),
        label=jnp.zeros((4, 2), jnp.int32),
        valid=jnp.ones((4, 2), bool),
    )

    # Fresh COPIES of the initial variables for the tensor-parallel state:
    # the dp step below donates its state, and device_put-based placement
    # (replicate/shard_train_state) may alias rather than copy a single-
    # device source buffer — reusing `variables` after that step would
    # read donated-away memory. Copy BEFORE the donating step runs.
    variables_tp = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), variables
    )

    # Reference: pure data-parallel on a (4, 1) mesh.
    mesh_dp = make_mesh(n_data=4, devices=jax.devices()[:4])
    state_dp = create_train_state(model, variables, tx)
    with mesh_dp:
        state_dp = replicate(mesh_dp, state_dp)
        step = make_sharded_train_step(model, tx, mesh_dp)
        state_dp, m_dp = step(
            state_dp, shard_batch(mesh_dp, images), shard_batch(mesh_dp, targets)
        )

    # Tensor-parallel: (2, 2) mesh, conv out-channels sharded over model.
    mesh_tp = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    assert mesh_tp.shape[MODEL_AXIS] == 2
    state_tp = create_train_state(model, variables_tp, tx)
    with mesh_tp:
        state_tp = shard_train_state(state_tp, mesh_tp)
        # The sharding rule actually sharded something (not a no-op test).
        sharded_leaves = [
            x
            for x in jax.tree_util.tree_leaves(state_tp.params)
            if getattr(x.sharding, "spec", None)
            and any(s == MODEL_AXIS for s in x.sharding.spec)
        ]
        assert sharded_leaves, "no parameter was model-sharded"
        step_tp = make_sharded_train_step(
            model, tx, mesh_tp, model_parallel=True
        )
        state_tp, m_tp = step_tp(
            state_tp, shard_batch(mesh_tp, images), shard_batch(mesh_tp, targets)
        )

    assert np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_dp["loss"]), rtol=1e-4
    )
    # Parameters after one step agree leaf-for-leaf. Tolerances: adamw
    # divides by sqrt(second moment), so where a gradient element is ~0
    # the f32 reduction-order difference between the bracketings is
    # amplified to ~lr scale — observed as isolated ~2e-3 outliers
    # (1/8192 elements). Pointwise bound covers those; the aggregate bound
    # keeps the comparison discriminative (a real partitioning bug moves
    # whole channels, not lone elements).
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(state_dp.params))
    flat_tp = jax.tree_util.tree_leaves(jax.device_get(state_tp.params))
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-2)
        assert np.mean(np.abs(np.asarray(a) - np.asarray(b))) < 1e-4


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
