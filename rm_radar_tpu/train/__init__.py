from .loss import DetectionTargets, detection_loss
from .train_step import TrainState, create_train_state, make_sharded_train_step, train_step

__all__ = [
    "DetectionTargets",
    "detection_loss",
    "TrainState",
    "create_train_state",
    "make_sharded_train_step",
    "train_step",
]
