"""Checkpoint save/load for model variables.

Replaces the reference's TensorRT engine cache (detector.cpp:74-99: parse
ONNX once, serialize the engine next to it, reload on later runs): weights
live in a flat .npz, converted once from an Ultralytics checkpoint
(tools/convert_weights.py), and XLA's persistent compilation cache plays the
role of the serialized engine.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/" if prefix or True else k))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_variables(path: str, variables: Any) -> None:
    """Save a flax variables pytree ({'params': ..., 'batch_stats': ...})."""
    import jax

    host = jax.tree_util.tree_map(np.asarray, variables)
    np.savez_compressed(path, **_flatten(dict(host)))


def load_variables(path: str) -> Dict[str, Any]:
    """Load variables saved by :func:`save_variables` (host numpy tree)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)
