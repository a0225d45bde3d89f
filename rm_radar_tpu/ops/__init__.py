from .detect_ops import decode, nms, postprocess
from .preprocess import letterbox, letterbox_batch, letterbox_crop

__all__ = [
    "decode",
    "nms",
    "postprocess",
    "letterbox",
    "letterbox_batch",
    "letterbox_crop",
]
