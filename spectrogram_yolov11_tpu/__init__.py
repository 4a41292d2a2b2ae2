"""spectrogram_yolov11_tpu: a TPU-native (JAX/XLA/Pallas) detection framework
with the capability surface of the Ultralytics-YOLO11 spectrogram fork.

Public API mirrors the reference (`YOLO(model).train/val/predict/track/export`)
over a functional SPMD core. See SURVEY.md at the repo root for the component
map this build follows.
"""

__version__ = "0.1.0"

from spectrogram_yolov11_tpu.utils import ASSETS, DEFAULT_CFG  # noqa: F401


def __getattr__(name):
    # Lazy imports keep `import spectrogram_yolov11_tpu` light (no jax compile).
    if name == "YOLO":
        from spectrogram_yolov11_tpu.engine.model import YOLO

        return YOLO
    if name == "YOLOWorld":
        from spectrogram_yolov11_tpu.engine.model import YOLOWorld

        return YOLOWorld
    if name == "RTDETR":
        from spectrogram_yolov11_tpu.models.rtdetr import RTDETR

        return RTDETR
    if name in ("FastSAM", "NAS", "SAM"):
        import importlib

        return getattr(importlib.import_module(f"spectrogram_yolov11_tpu.models.{name.lower()}"), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["YOLO", "YOLOWorld", "RTDETR", "FastSAM", "NAS", "SAM", "ASSETS", "DEFAULT_CFG", "__version__"]
