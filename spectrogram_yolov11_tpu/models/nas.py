"""YOLO-NAS facade (reference: /root/reference/ultralytics/models/nas/).

The reference NAS is a pure wrapper: it loads super-gradients pretrained
checkpoints (no YAML architecture exists) and routes them through the detect
predictor/validator with xyxy+scores postprocess. super-gradients is a torch
runtime dependency that cannot run on the TPU path, so here:

- `NAS(path.ckpt)` wraps any of our detection checkpoints with the NAS
  surface (predict/val/info), matching the facade contract;
- `NAS('yolo_nas_s')`/.pt raise the same informative constraint the
  reference raises for YAMLs — pretrained super-gradients weights are not
  importable in this zero-egress TPU build (documented deviation).
"""

from __future__ import annotations

from pathlib import Path


class NAS:
    """`NAS('model.ckpt')` — detection facade with the YOLO-NAS surface
    (reference: models/nas/model.py:26)."""

    def __new__(cls, model: str = "yolo_nas_s.pt"):
        suffix = Path(str(model)).suffix
        assert suffix not in {".yaml", ".yml"}, "YOLO-NAS models only support pre-trained models."
        if suffix != ".ckpt":
            raise NotImplementedError(
                "super-gradients pretrained weights are torch-runtime artifacts; this TPU build "
                "wraps framework .ckpt checkpoints with the NAS surface instead. "
                "Train a detector (yolo detect train ...) and pass its best.ckpt."
            )
        from spectrogram_yolov11_tpu.engine.model import YOLO

        return YOLO(model, task="detect")
