"""Checkpoint save/load roundtrip and torch-checkpoint conversion mapping."""

import os
import sys

import jax
import numpy as np
import pytest

from rm_radar_tpu.models.weights import load_variables, save_variables
from rm_radar_tpu.models.yolov8 import create_model, init_params

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_save_load_roundtrip(tmp_path):
    model, _ = create_model(variant="n", num_classes=3, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_variables(path, variables)
    loaded = load_variables(path)

    flat_orig = jax.tree_util.tree_leaves_with_path(variables)
    flat_load = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(loaded)
    )
    assert len(flat_orig) == len(flat_load)
    for key, value in flat_orig:
        np.testing.assert_array_equal(
            flat_load[jax.tree_util.keystr(key)], np.asarray(value)
        )


def test_loaded_variables_run_forward(tmp_path):
    import jax.numpy as jnp

    model, _ = create_model(variant="n", num_classes=3, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_variables(path, variables)
    loaded = load_variables(path)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out_a = model.apply(variables, x)
    out_b = model.apply(loaded, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_torch_state_dict_mapping():
    """The converter must map Ultralytics module paths onto our Flax tree:
    conv weights transposed OIHW->HWIO, BN params split across collections,
    C2f bottlenecks under m{i}, Detect branches under box{i}_{j}/cls{i}_{j}.
    """
    torch = pytest.importorskip("torch")
    from convert_weights import convert_state_dict

    sd = {
        "model.0.conv.weight": torch.arange(16 * 3 * 3 * 3, dtype=torch.float32).reshape(16, 3, 3, 3),
        "model.0.bn.weight": torch.ones(16),
        "model.0.bn.bias": torch.zeros(16),
        "model.0.bn.running_mean": torch.zeros(16),
        "model.0.bn.running_var": torch.ones(16),
        "model.0.bn.num_batches_tracked": torch.tensor(0),
        "model.2.m.0.cv1.conv.weight": torch.zeros(8, 8, 3, 3),
        "model.22.cv2.1.2.weight": torch.zeros(64, 32, 1, 1),
        "model.22.cv2.1.2.bias": torch.zeros(64),
        "model.22.dfl.conv.weight": torch.arange(16, dtype=torch.float32).reshape(1, 16, 1, 1),
        "model.10.anything": torch.zeros(1),  # Upsample: no params, ignored
    }
    tree = convert_state_dict(sd)
    stem = tree["params"]["backbone"]["stem"]
    assert stem["conv"]["kernel"].shape == (3, 3, 3, 16)
    assert stem["bn"]["scale"].shape == (16,)
    assert tree["batch_stats"]["backbone"]["stem"]["bn"]["mean"].shape == (16,)
    c2f = tree["params"]["backbone"]["c2f_2"]["m0"]["cv1"]
    assert c2f["conv"]["kernel"].shape == (3, 3, 8, 8)
    head = tree["params"]["head"]["box1_2"]
    assert head["kernel"].shape == (1, 1, 32, 64)
    assert head["bias"].shape == (64,)
    # DFL is computed analytically in decode; must not appear in the tree.
    assert "dfl" not in str(tree).lower()


def test_converted_tree_matches_model_structure():
    """Every leaf the converter produces for a synthetic full state dict must
    exist in the real model's variable tree with the same shape (guards
    against layer-name drift between the converter and the Flax model)."""
    torch = pytest.importorskip("torch")
    from convert_weights import convert_state_dict

    model, _ = create_model(variant="n", num_classes=3, input_size=(64, 64))
    variables = init_params(model, jax.random.PRNGKey(0))

    # Build the torch-side names for a few representative modules and check
    # the mapped paths resolve in the model tree.
    cases = {
        "model.1.conv.weight": ("params", "backbone", "down2", "conv", "kernel"),
        "model.4.cv2.bn.weight": ("params", "backbone", "c2f_3", "cv2", "bn", "scale"),
        "model.9.cv1.conv.weight": ("params", "backbone", "sppf", "cv1", "conv", "kernel"),
        "model.12.cv1.conv.weight": ("params", "neck", "up_c2f_4", "cv1", "conv", "kernel"),
        "model.16.conv.weight": ("params", "neck", "down_conv_3", "conv", "kernel"),
        "model.21.m.0.cv2.conv.weight": ("params", "neck", "down_c2f_5", "m0", "cv2", "conv", "kernel"),
        "model.22.cv3.2.0.conv.weight": ("params", "head", "cls2_0", "conv", "kernel"),
    }
    for torch_name, flax_path in cases.items():
        node = variables
        for p in flax_path:
            assert p in node, (torch_name, flax_path, p, list(node))
            node = node[p]
        shape = np.asarray(node).shape
        if flax_path[-1] == "kernel":
            t = torch.zeros(shape[3], shape[2], shape[0], shape[1])
        else:
            t = torch.zeros(shape[0])
        tree = convert_state_dict({torch_name: t})
        out = tree
        for p in flax_path:
            assert p in out, (torch_name, flax_path, p, list(out))
            out = out[p]
        assert np.asarray(out).shape == shape
