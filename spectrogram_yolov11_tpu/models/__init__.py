"""Per-model task plug-ins (reference: ultralytics/models/).

The YOLO family's trainers/validators/predictors live in engine/ (they ARE
the base classes here, unlike the reference which keeps bases abstract);
this package holds the non-YOLO model families: RT-DETR, FastSAM, NAS, SAM.
"""

from spectrogram_yolov11_tpu.models.rtdetr import RTDETR, RTDETRTrainer, RTDETRValidator

__all__ = ["RTDETR", "RTDETRTrainer", "RTDETRValidator", "SAM2", "SAM2Predictor", "SAM2VideoPredictor"]


def __getattr__(name):  # lazy: SAM2 pulls in the full flax module zoo
    if name in ("SAM2", "SAM2Predictor", "SAM2VideoPredictor"):
        from spectrogram_yolov11_tpu.models import sam2

        return getattr(sam2, name)
    raise AttributeError(name)
