"""YOLOv8 model structure tests: output layout parity with the ONNX exports
the reference consumes ([B, 4+nc, A], reference detector.cpp:129-130;
doc/识别优化.md:21 documents 84 channels / 8400 anchors for yolov8n@640),
plus parameter counts against the published Ultralytics sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rm_radar_tpu.models.yolov8 import (
    YoloConfig,
    anchor_points,
    create_model,
    init_params,
)


def test_anchor_counts_640():
    cfg = YoloConfig(variant="n", num_classes=80, input_size=(640, 640))
    assert cfg.num_anchors == 8400  # 80*80 + 40*40 + 20*20
    pts, strides = anchor_points((640, 640))
    assert pts.shape == (8400, 2)
    assert float(pts[0, 0]) == 0.5
    np.testing.assert_allclose(
        np.unique(np.asarray(strides)), [8.0, 16.0, 32.0]
    )


def test_tiny_forward_output_layout():
    model, cfg = create_model(variant="n", num_classes=12, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    a = cfg.num_anchors
    assert a == 8 * 8 + 4 * 4 + 2 * 2
    assert out.shape == (2, 4 + 12, a)
    # class scores are sigmoided
    scores = np.asarray(out[:, 4:, :])
    assert scores.min() >= 0.0 and scores.max() <= 1.0


def test_param_count_yolov8n():
    # Ultralytics yolov8n (80 classes): ~3.15M parameters.
    model, _ = create_model(variant="n", num_classes=80, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 2.9e6 < n < 3.4e6, n


@pytest.mark.slow
def test_param_count_yolov8m():
    # Ultralytics yolov8m (80 classes): ~25.9M parameters.
    model, _ = create_model(variant="m", num_classes=80, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 24e6 < n < 28e6, n


def test_raw_head_shapes():
    model, cfg = create_model(variant="n", num_classes=5, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    raw = model.apply(variables, x, method="raw")
    assert len(raw) == 3
    for (box, cls), g in zip(raw, (8, 4, 2)):
        assert box.shape == (1, g, g, 4 * cfg.reg_max)
        assert cls.shape == (1, g, g, 5)


def test_s2d_stem_matches_standard_stem():
    """The space-to-depth stem with the adapted kernel must reproduce the
    standard k3/s2 stem exactly (same random weights, transformed)."""
    import numpy as np
    from rm_radar_tpu.models.weights import maybe_adapt_stem

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32))

    from rm_radar_tpu.models.yolov8 import YoloV8

    cfg_std = YoloConfig(
        variant="n", num_classes=3, input_size=(64, 64), s2d_stem=False
    )
    model_std = YoloV8(cfg_std)
    variables = init_params(model_std, jax.random.PRNGKey(7))
    out_std = model_std.apply(variables, x)

    model_s2d, _ = create_model(variant="n", num_classes=3, input_size=(64, 64))
    assert model_s2d.cfg.s2d_stem
    adapted = maybe_adapt_stem(
        jax.tree_util.tree_map(np.asarray, dict(variables)), True
    )
    out_s2d = model_s2d.apply(adapted, x)
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_std), atol=2e-4, rtol=1e-4
    )
