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


def stem_kernel_to_s2d(kernel: np.ndarray) -> np.ndarray:
    """Exact re-expression of a k3/s2 stem conv kernel [3, 3, C, O] as the
    equivalent k2/s1 kernel [2, 2, 4C, O] over the 2x2 space-to-depth input
    (channel order (p, q, c); output pixel (i, j) reads s2d rows i-1..i with
    top/left padding 1). Numerically identical convolution.
    """
    k = np.asarray(kernel)
    assert k.shape[:2] == (3, 3), k.shape
    c, o = k.shape[2], k.shape[3]
    w2 = np.zeros((2, 2, 4 * c, o), k.dtype)
    for a in range(2):
        for b in range(2):
            for p in range(2):
                for q in range(2):
                    dy = 2 * (a - 1) + p + 1
                    dx = 2 * (b - 1) + q + 1
                    if 0 <= dy < 3 and 0 <= dx < 3:
                        w2[a, b, (p * 2 + q) * c : (p * 2 + q + 1) * c] = k[dy, dx]
    return w2


def stem_kernel_from_s2d(kernel: np.ndarray):
    """Project a k2/s1 space-to-depth stem kernel [2, 2, 4C, O] back to the
    standard k3/s2 layout [3, 3, C, O].

    Exact inverse of :func:`stem_kernel_to_s2d` on its image. A kernel
    *trained natively* in s2d layout has 48 taps where k3/s2 has 27: the
    out-of-support taps (receptive-field positions a k3/s2 conv cannot see)
    are dropped. Returns (kernel, residual_fraction) where residual_fraction
    is the squared-norm share of the dropped taps (0.0 for kernels produced
    by the forward transform)."""
    w2 = np.asarray(kernel)
    assert w2.shape[:2] == (2, 2), w2.shape
    c, o = w2.shape[2] // 4, w2.shape[3]
    k = np.zeros((3, 3, c, o), w2.dtype)
    used = np.zeros(w2.shape, bool)
    for a in range(2):
        for b in range(2):
            for p in range(2):
                for q in range(2):
                    dy = 2 * (a - 1) + p + 1
                    dx = 2 * (b - 1) + q + 1
                    if 0 <= dy < 3 and 0 <= dx < 3:
                        sl = slice((p * 2 + q) * c, (p * 2 + q + 1) * c)
                        k[dy, dx] = w2[a, b, sl]
                        used[a, b, sl] = True
    total = float(np.sum(w2.astype(np.float64) ** 2))
    resid = float(np.sum(w2[~used].astype(np.float64) ** 2)) / max(
        total, 1e-12
    )
    return k, resid


def maybe_adapt_stem(variables: Any, wants_s2d: bool) -> Any:
    """Adapt a checkpoint's stem kernel to/from the space-to-depth layout.

    Standard checkpoints (Ultralytics conversions, non-s2d training runs)
    carry a [3, 3, C, O] stem; a model built with ``s2d_stem=True`` expects
    [2, 2, 4C, O]. The transform is exact, so loaders apply it silently.
    The reverse direction (s2d checkpoint into a standard model) is not
    generally expressible and raises.
    """
    try:
        stem = variables["params"]["backbone"]["stem"]["conv"]
    except (KeyError, TypeError):
        return variables
    kernel = np.asarray(stem["kernel"])
    if wants_s2d and kernel.shape[:2] == (3, 3):
        stem = dict(stem)
        stem["kernel"] = stem_kernel_to_s2d(kernel)
        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"]["backbone"] = dict(variables["params"]["backbone"])
        variables["params"]["backbone"]["stem"] = dict(
            variables["params"]["backbone"]["stem"]
        )
        variables["params"]["backbone"]["stem"]["conv"] = stem
    elif not wants_s2d and kernel.shape[:2] == (2, 2):
        raise ValueError(
            "checkpoint has a space-to-depth stem; load it into a model "
            "with s2d_stem=True"
        )
    return variables
