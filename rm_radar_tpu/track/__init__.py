from . import auction, device_tracker, kalman, singer
from .auction import NOT_MATCHED
from .features import Features
from .kalman import GaussianState, ekf_predict, ekf_update, kf_predict, kf_update
from .tracker import RobotObservation, Track, Tracker

__all__ = [
    "auction",
    "device_tracker",
    "kalman",
    "singer",
    "NOT_MATCHED",
    "Features",
    "GaussianState",
    "ekf_predict",
    "ekf_update",
    "kf_predict",
    "kf_update",
    "RobotObservation",
    "Track",
    "Tracker",
]
