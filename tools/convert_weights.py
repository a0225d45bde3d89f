#!/usr/bin/env python
"""Convert an Ultralytics YOLOv8 checkpoint (.pt) to rm_radar_tpu .npz.

The reference ships car.onnx / armor.onnx (Ultralytics ONNX exports) and
builds TensorRT engines from them (reference src/detect/detector.cpp:177-243).
This converter plays the equivalent role for the TPU stack: it maps the
torch module tree of ``ultralytics.nn.tasks.DetectionModel`` onto the Flax
parameter tree of :class:`rm_radar_tpu.models.yolov8.YoloV8` 1:1.

Usage:
    python tools/convert_weights.py yolov8m.pt out.npz [--classes 12]

Torch (CPU) is only needed when actually converting; the framework itself
never imports it.
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Any, Dict

import numpy as np

# Ultralytics DetectionModel layer indices -> our module paths.
_LAYER_MAP = {
    0: "backbone/stem",
    1: "backbone/down2",
    2: "backbone/c2f_2",
    3: "backbone/down3",
    4: "backbone/c2f_3",
    5: "backbone/down4",
    6: "backbone/c2f_4",
    7: "backbone/down5",
    8: "backbone/c2f_5",
    9: "backbone/sppf",
    12: "neck/up_c2f_4",
    15: "neck/up_c2f_3",
    16: "neck/down_conv_3",
    18: "neck/down_c2f_4",
    19: "neck/down_conv_4",
    21: "neck/down_c2f_5",
    22: "head",
}


def _convert_tensor(name_parts, tensor):
    """One torch tensor -> (flax key suffix parts, collection, array)."""
    arr = tensor.detach().cpu().numpy()
    leaf = name_parts[-1]
    owner = name_parts[-2]
    if owner == "conv" or re.fullmatch(r"(box|cls)\d_2", owner):
        if leaf == "weight":  # [O, I, kh, kw] -> [kh, kw, I, O]
            return name_parts[:-1] + ["kernel"], "params", arr.transpose(2, 3, 1, 0)
        if leaf == "bias":
            return name_parts[:-1] + ["bias"], "params", arr
    if owner == "bn":
        if leaf == "weight":
            return name_parts[:-1] + ["scale"], "params", arr
        if leaf == "bias":
            return name_parts[:-1] + ["bias"], "params", arr
        if leaf == "running_mean":
            return name_parts[:-1] + ["mean"], "batch_stats", arr
        if leaf == "running_var":
            return name_parts[:-1] + ["var"], "batch_stats", arr
        if leaf == "num_batches_tracked":
            return None
    raise ValueError(f"unmapped tensor: {'.'.join(name_parts)} {arr.shape}")


def _map_module(parts) -> list | None:
    """Map torch module path parts (after 'model.<idx>') to flax path parts."""
    idx = int(parts[0])
    if idx not in _LAYER_MAP:
        return None  # Upsample / Concat have no params
    base = _LAYER_MAP[idx].split("/")
    rest = parts[1:]
    if idx == 22:  # Detect head: cv2/cv3 -> box{i}_j / cls{i}_j
        if rest[0] == "dfl":
            return None  # DFL conv is the fixed arange; computed in decode
        branch = {"cv2": "box", "cv3": "cls"}[rest[0]]
        scale, seq = int(rest[1]), int(rest[2])
        inner = rest[3:]
        return base + [f"{branch}{scale}_{seq}"] + list(inner)
    out = list(base)
    for p in rest:
        if p == "m":
            continue
        if p.isdigit():
            out.append(f"m{p}")
        else:
            out.append(p)
    return out


def convert_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch state_dict -> flax variables {'params': ..., 'batch_stats': ...}.

    Handles both training checkpoints (separate Conv + BatchNorm) and fused
    exports (the Ultralytics ONNX path folds BN into the conv, which then
    carries a bias): a fused conv bias is re-expressed as an identity
    BatchNorm whose shift is the bias, keeping one Flax model structure.
    """
    tree: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    fused_biases = []  # (module_path, bias array) for BN-folded convs
    for name, tensor in state_dict.items():
        parts = name.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        mapped = _map_module(parts)
        if mapped is None:
            continue
        if (
            len(mapped) >= 2
            and mapped[-2] == "conv"
            and mapped[-1] == "bias"
        ):
            fused_biases.append(
                (mapped[:-2], tensor.detach().cpu().numpy())
            )
            continue
        res = _convert_tensor(mapped, tensor)
        if res is None:
            continue
        flax_parts, collection, arr = res
        node = tree[collection]
        for p in flax_parts[:-1]:
            node = node.setdefault(p, {})
        node[flax_parts[-1]] = arr

    eps = 1e-3  # matches the model's BatchNorm epsilon
    for module_path, bias in fused_biases:
        c = bias.shape[0]
        pnode = tree["params"]
        snode = tree["batch_stats"]
        for p in module_path:
            pnode = pnode.setdefault(p, {})
            snode = snode.setdefault(p, {})
        if "bn" in pnode:
            continue  # real BN present; the bias was something else
        pnode["bn"] = {
            "scale": np.ones(c, np.float32),
            "bias": np.asarray(bias, np.float32),
        }
        snode["bn"] = {
            "mean": np.zeros(c, np.float32),
            "var": np.full(c, 1.0 - eps, np.float32),
        }
    return tree


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("output")
    args = parser.parse_args()

    try:
        import torch  # full unpickle needs torch AND ultralytics

        ckpt = torch.load(
            args.checkpoint, map_location="cpu", weights_only=False
        )
        model = (
            ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt
            else ckpt
        )
        state_dict = model.float().state_dict()
    except Exception as e:
        # A real Ultralytics .pt references ultralytics classes; without
        # that package torch.load fails. The stdlib+numpy stub loader reads
        # the archive directly (rm_radar_tpu/models/pt_loader.py; validated
        # on genuine-format archives in tests/test_pt_real.py).
        print(
            f"torch.load failed ({type(e).__name__}: {e}); "
            "falling back to the ultralytics-free stub loader",
            file=sys.stderr,
        )
        from rm_radar_tpu.models.pt_loader import load_ultralytics_state_dict

        sys.path.insert(0, ".")
        state_dict = load_ultralytics_state_dict(args.checkpoint)

    class _Np:  # convert_state_dict expects .detach().cpu().numpy()
        def __init__(self, a):
            self._a = np.asarray(a)

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self._a

    state_dict = {
        k: (v if hasattr(v, "detach") else _Np(v))
        for k, v in state_dict.items()
    }
    variables = convert_state_dict(state_dict)

    sys.path.insert(0, ".")
    from rm_radar_tpu.models.weights import save_variables

    save_variables(args.output, variables)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
