from .yolov8 import YoloConfig, YoloV8, create_model, decode_predictions, init_params

__all__ = [
    "YoloConfig",
    "YoloV8",
    "create_model",
    "decode_predictions",
    "init_params",
]
