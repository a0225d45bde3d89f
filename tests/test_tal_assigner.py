"""Task-aligned assigner tests: masked fixed-capacity TAL must obey the
Ultralytics semantics (top-k by alignment inside the gt, conflicts to the
best-aligned gt, padded gts never assigned) and train end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from rm_radar_tpu.train.loss import DetectionTargets, detection_loss, tal_assign


def test_tal_assign_properties():
    b, a, g, c = 2, 12, 3, 4
    rng = np.random.default_rng(0)
    inside = np.zeros((b, a, g), bool)
    inside[0, 0:6, 0] = True  # gt0 covers anchors 0..5
    inside[0, 4:9, 1] = True  # gt1 overlaps on 4..5
    # gt2 is a padded slot: inside stays all-False.
    inside[1, :, :] = False

    cls_logits = jnp.asarray(rng.normal(size=(b, a, c)), jnp.float32)
    pred = np.zeros((b, a, 4), np.float32)
    pred[..., 2:] = 10.0  # all anchors predict the same box
    gt = np.zeros((b, g, 4), np.float32)
    gt[..., 2:] = 10.0
    label = np.zeros((b, g), np.int32)

    assigned, positive, soft = jax.jit(
        lambda *args: tal_assign(*args, top_k=2)
    )(
        jnp.asarray(inside),
        cls_logits,
        jnp.asarray(pred),
        jnp.asarray(gt),
        jnp.asarray(label),
    )
    assigned, positive, soft = map(np.asarray, (assigned, positive, soft))

    # No positives outside `inside`; image 1 has none at all.
    assert not positive[1].any()
    outside = ~inside.any(axis=-1)
    assert not positive[outside].any()
    # Each gt holds at most top_k anchors.
    for gi in range(g):
        assert (assigned[0][positive[0]] == gi).sum() <= 2
    # Soft targets positive exactly on positives, and bounded by best IoU=1.
    assert (soft[positive] > 0).all() and (soft[positive] <= 1.0 + 1e-6).all()
    assert (soft[~positive] == 0).all()
    # Every positive anchor is inside its assigned gt.
    pb, pa = np.nonzero(positive)
    assert inside[pb, pa, assigned[pb, pa]].all()


def test_detection_loss_tal_trains():
    from rm_radar_tpu.models.yolov8 import create_model, init_params

    model, cfg = create_model(
        variant="n", num_classes=3, input_size=(64, 64), dtype=jnp.float32
    )
    variables = init_params(model, jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    targets = DetectionTargets(
        xywh=jnp.asarray([[[8.0, 8.0, 30.0, 24.0], [0, 0, 0, 0]]]),
        label=jnp.asarray([[1, 0]], jnp.int32),
        valid=jnp.asarray([[True, False]]),
    )

    def loss_fn(params):
        raw = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            img,
            train=True,
            mutable=["batch_stats"],
            method=type(model).raw,
        )[0]
        return detection_loss(raw, targets, cfg, assigner="tal")[0]

    l0, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(l0))
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert np.isfinite(norms).all() and max(norms) > 0
    # Two SGD steps strictly reduce the loss.
    params = variables["params"]
    for _ in range(2):
        _, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g, params, grads)
    assert float(loss_fn(params)) < float(l0)
