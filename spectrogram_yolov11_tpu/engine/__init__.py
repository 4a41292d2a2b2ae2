from .model import YOLO  # noqa: F401
