"""Per-model task plug-ins (reference: ultralytics/models/).

The YOLO family's trainers/validators/predictors live in engine/ (they ARE
the base classes here, unlike the reference which keeps bases abstract);
this package holds the non-YOLO model families: RT-DETR, FastSAM, NAS, SAM.
"""

from spectrogram_yolov11_tpu.models.rtdetr import RTDETR, RTDETRTrainer, RTDETRValidator

__all__ = ["RTDETR", "RTDETRTrainer", "RTDETRValidator"]
