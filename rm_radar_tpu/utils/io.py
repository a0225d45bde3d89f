"""Host-side I/O: PCD point-cloud parsing and image loading.

Replaces the reference's PCL (pcl::io::loadPCDFile, samples/main.cpp:58) and
OpenCV (cv::imread, samples/main.cpp:36) dependencies with a small pure-Python
loader. Images are returned uint8 HWC in BGR channel order to keep the
cv::imread convention the rest of the pipeline assumes.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def load_pcd(path: str) -> np.ndarray:
    """Parse a PCD v0.7 file with x/y/z float fields into float32 [N, 3].

    Supports ``DATA ascii`` and ``DATA binary`` for FIELDS x y z (the format
    of the bundled assets/clouds/*.pcd, which store values in millimeters).
    Uses the native C++ parser when built (tools/build_native.sh); falls back
    to this pure-Python implementation otherwise.
    """
    from ..native import available, parse_pcd_bytes

    if available():
        with open(path, "rb") as f:
            result = parse_pcd_bytes(f.read())
        if result is not None:
            return result
    with open(path, "rb") as f:
        header = {}
        data_mode = None
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, value = line.partition(" ")
            header[key.upper()] = value
            if key.upper() == "DATA":
                data_mode = value.strip().lower()
                break
        fields = header.get("FIELDS", "x y z").split()
        if fields[:3] != ["x", "y", "z"]:
            raise ValueError(f"unsupported PCD fields: {fields}")
        sizes = [int(s) for s in header.get("SIZE", "4 4 4").split()]
        types = header.get("TYPE", "F F F").split()
        n_points = int(header.get("POINTS", header.get("WIDTH", "0")))

        if data_mode == "ascii":
            body = f.read().decode("ascii", errors="replace")
            values = np.array(body.split(), dtype=np.float32)
            values = values.reshape(-1, len(fields))[:n_points, :3]
            return np.ascontiguousarray(values, dtype=np.float32)
        elif data_mode == "binary":
            dtype = np.dtype(
                {
                    "names": fields,
                    "formats": [
                        {"F": f"<f{s}", "U": f"<u{s}", "I": f"<i{s}"}[t]
                        for t, s in zip(types, sizes)
                    ],
                }
            )
            raw = np.frombuffer(f.read(dtype.itemsize * n_points), dtype=dtype)
            return np.stack(
                [raw["x"], raw["y"], raw["z"]], axis=-1
            ).astype(np.float32)
        else:
            raise ValueError(f"unsupported PCD data mode: {data_mode}")


def save_pcd(path: str, points: np.ndarray) -> None:
    """Write float32 [N, 3] points as an ASCII PCD v0.7 file."""
    points = np.asarray(points, dtype=np.float32)
    with open(path, "w") as f:
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            "COUNT 1 1 1\n"
            f"WIDTH {len(points)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {len(points)}\nDATA ascii\n"
        )
        np.savetxt(f, points, fmt="%.6g")


def load_image_bgr(path: str) -> np.ndarray:
    """Load an image as uint8 HWC BGR (the cv::imread convention)."""
    from PIL import Image

    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return np.ascontiguousarray(rgb[..., ::-1])


def pad_points(points: np.ndarray, capacity: int) -> np.ndarray:
    """Zero-pad / truncate a point cloud to a fixed capacity.

    Zero points are ignored by the locator (reference locate.cpp:176-178
    skips (0,0,0) points), so zero-padding is semantically a no-op.
    """
    points = np.asarray(points, dtype=np.float32)
    out = np.zeros((capacity, 3), dtype=np.float32)
    n = min(len(points), capacity)
    out[:n] = points[:n]
    return out


def load_asset_sequence(
    asset_dir: str, count: int = 10
) -> tuple[List[np.ndarray], List[np.ndarray], Optional[np.ndarray]]:
    """Load the bundled 10-frame asset sequence (images + clouds + background).

    Mirrors the reference sample's readImages/readClouds (samples/main.cpp:
    24-72). Returns (images, clouds, background_cloud); background may be
    None when background.pcd is absent from the snapshot.
    """
    images = [
        load_image_bgr(os.path.join(asset_dir, "images", f"{i}.jpg"))
        for i in range(count)
    ]
    clouds = [
        load_pcd(os.path.join(asset_dir, "clouds", f"{i}.pcd"))
        for i in range(count)
    ]
    bg_path = os.path.join(asset_dir, "clouds", "background.pcd")
    background = load_pcd(bg_path) if os.path.exists(bg_path) else None
    return images, clouds, background
