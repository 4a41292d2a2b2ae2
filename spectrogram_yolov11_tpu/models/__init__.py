"""Per-model task plug-ins (reference: ultralytics/models/).

The YOLO family's trainers/validators/predictors live in engine/ (they ARE
the base classes here, unlike the reference which keeps bases abstract);
this package holds the non-YOLO model families: RT-DETR, FastSAM, NAS, SAM.
"""

from spectrogram_yolov11_tpu.models.rtdetr import RTDETR, RTDETRTrainer, RTDETRValidator

__all__ = ["RTDETR", "RTDETRTrainer", "RTDETRValidator", "SAM", "SAMPredictor",
           "SAM2", "SAM2Predictor", "SAM2VideoPredictor", "FastSAM", "NAS"]

# lazy family exports: each pulls a large flax module tree, so resolve on use
_LAZY = {
    "SAM": "sam", "SAMPredictor": "sam",
    "SAM2": "sam2", "SAM2Predictor": "sam2", "SAM2VideoPredictor": "sam2",
    "FastSAM": "fastsam", "NAS": "nas",
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is not None:
        import importlib

        return getattr(importlib.import_module(f"spectrogram_yolov11_tpu.models.{mod}"), name)
    raise AttributeError(name)
