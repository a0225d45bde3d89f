"""Native (C++) IO helpers with ctypes bindings and Python fallbacks.

The reference's IO layer is native (PCL for clouds, OpenCV for images);
here a small C++ shared library covers the hot parsing paths. Python
fallbacks keep the framework importable before `tools/build_native.sh`
has run.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpcd_parser.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pcd_parse.restype = ctypes.c_long
        lib.pcd_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_pcd_bytes(
    data: bytes, max_points: Optional[int] = None
) -> Optional[np.ndarray]:
    """Parse PCD file bytes into float32 [N, 3]; None if the native lib is
    unavailable (callers fall back to the Python parser)."""
    lib = _load()
    if lib is None:
        return None
    if max_points is None:
        # Cheap header peek for the exact allocation size. The header count
        # is untrusted input: clamp it to what the payload could possibly
        # hold (a point needs >= 2 bytes even in the tersest ASCII form), so
        # a malformed "POINTS 999999999999" line cannot drive a huge
        # allocation, and a negative count cannot reach the native layer.
        head = data[:512]
        max_points = 1 << 20
        for line in head.split(b"\n"):
            if line.startswith(b"POINTS"):
                try:
                    max_points = int(line.split()[1])
                except (IndexError, ValueError):
                    pass
                break
        max_points = max(0, min(max_points, len(data) // 2 + 1))
    out = np.empty((max_points, 3), dtype=np.float32)
    n = lib.pcd_parse(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points,
    )
    if n < 0:
        raise ValueError("malformed PCD header")
    return out[:n].copy()
