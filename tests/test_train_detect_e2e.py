"""Learning end-to-end test: overfit tiny YOLOv8 on one synthetic image and
confirm the full inference path (forward -> decode -> NMS -> restore) finds
the object. This closes the loop between train/ (loss, step) and detect/
(decode, NMS): a bug in either side breaks it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rm_radar_tpu.geometry import pairwise_iou
from rm_radar_tpu.models.yolov8 import create_model, init_params
from rm_radar_tpu.ops.detect_ops import decode, nms
from rm_radar_tpu.train.loss import DetectionTargets
from rm_radar_tpu.train.train_step import create_train_state, train_step


@pytest.mark.slow
def test_overfit_single_box_then_detect():
    size = 64
    model, cfg = create_model(variant="n", num_classes=2, input_size=(size, size))
    variables = init_params(model, jax.random.PRNGKey(0))

    # Synthetic scene: bright square on dark background.
    img = np.zeros((size, size, 3), np.float32)
    box = (12.0, 20.0, 24.0, 20.0)  # x, y, w, h
    x, y, w, h = map(int, box)
    img[y : y + h, x : x + w] = 1.0
    images = jnp.asarray(img)[None]

    targets = DetectionTargets(
        xywh=jnp.asarray([[box]], jnp.float32),
        label=jnp.ones((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
    )

    tx = optax.adam(1e-2)
    state = create_train_state(model, variables, tx)
    step = jax.jit(
        lambda s, i, t: train_step(s, i, t, model=model, tx=tx)
    )
    losses = []
    for _ in range(200):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::20]

    # Inference with the trained weights.
    raw = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, images
    )[0]
    xywh, label, conf = decode(raw)
    dets = nms(
        xywh, label, conf,
        nms_thresh=0.65, conf_thresh=0.25, top_k=64, max_detections=4,
    )
    valid = np.asarray(dets.valid)
    assert valid.any(), "no detections after overfitting"
    best = int(np.argmax(np.asarray(dets.confidence)))
    assert int(np.asarray(dets.label)[best]) == 1
    iou = float(
        pairwise_iou(
            dets.xywh[best][None], jnp.asarray([box], jnp.float32)
        )[0, 0]
    )
    assert iou > 0.5, (np.asarray(dets.xywh[best]), iou)
