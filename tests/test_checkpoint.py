"""Orbax checkpoint/resume roundtrip for the training state."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rm_radar_tpu.train import checkpoint as ckpt
from rm_radar_tpu.train.train_step import TrainState, create_train_state


def _tiny_state(seed=0):
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(seed), (4, 3)),
        "b": jnp.zeros((3,)),
    }
    tx = optax.adam(1e-3)
    return (
        create_train_state(
            type("M", (), {})(), {"params": params, "batch_stats": {}}, tx
        ),
        tx,
    )


def test_checkpoint_roundtrip(tmp_path):
    state, _ = _tiny_state()
    mgr = ckpt.make_manager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert ckpt.restore_latest(mgr, state) is None
    ckpt.save(mgr, 0, state, wait=True)
    bumped = state._replace(step=state.step + 7)
    ckpt.save(mgr, 7, bumped, wait=True)
    assert ckpt.latest_step(mgr) == 7

    fresh, _ = _tiny_state(seed=1)  # different values, same structure
    restored = ckpt.restore_latest(mgr, fresh)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    assert isinstance(restored, TrainState)


def test_checkpoint_retention(tmp_path):
    state, _ = _tiny_state()
    mgr = ckpt.make_manager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        ckpt.save(mgr, s, state._replace(step=jnp.int32(s)), wait=True)
    steps = mgr.all_steps()
    assert 1 not in steps and set(steps) == {2, 3}


def test_ema_update():
    from rm_radar_tpu.train.train_step import ema_update

    ema = {"w": jnp.ones((3,))}
    params = {"w": jnp.zeros((3,))}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)
    # Fixed point: ema of itself is itself.
    out2 = ema_update(params, params, decay=0.999)
    np.testing.assert_allclose(np.asarray(out2["w"]), 0.0)
