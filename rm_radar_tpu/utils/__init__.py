from .io import load_image_bgr, load_pcd, pad_points, save_pcd
from .timer import StageTimer, maybe_profile

__all__ = [
    "load_image_bgr",
    "load_pcd",
    "pad_points",
    "save_pcd",
    "StageTimer",
    "maybe_profile",
]
