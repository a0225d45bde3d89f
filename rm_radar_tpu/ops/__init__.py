from .detect_ops import decode, nms, postprocess
from .pallas_kernels import foreground_compact
from .preprocess import (
    letterbox,
    letterbox_batch,
    letterbox_crop,
    letterbox_crop_s2d,
)

__all__ = [
    "decode",
    "nms",
    "postprocess",
    "letterbox",
    "letterbox_batch",
    "letterbox_crop",
    "letterbox_crop_s2d",
    "foreground_compact",
]
