from .detector import Detector, RobotDetector

__all__ = ["Detector", "RobotDetector"]
