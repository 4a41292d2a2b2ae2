"""Turnkey solutions (reference: /root/reference/ultralytics/solutions/__init__.py)."""

from .apps import (
    AIGym,
    Analytics,
    DistanceCalculation,
    Heatmap,
    ObjectBlurrer,
    ObjectCounter,
    ObjectCropper,
    ParkingManagement,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    SpectrumMonitor,
    SpeedEstimator,
    TrackZone,
    VisionEye,
)
from .solutions import BaseSolution

__all__ = [
    "AIGym", "Analytics", "BaseSolution", "DistanceCalculation", "Heatmap", "ObjectBlurrer",
    "ObjectCounter", "ObjectCropper", "ParkingManagement", "QueueManager", "RegionCounter",
    "SecurityAlarm", "SpectrumMonitor", "SpeedEstimator", "TrackZone", "VisionEye",
]
