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
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["YOLO", "ASSETS", "DEFAULT_CFG", "__version__"]
