"""YOLO-NAS (reference: /root/reference/ultralytics/models/nas/).

The reference NAS class is a wrapper that imports super-gradients at runtime
and downloads its pretrained torch checkpoints (model.py:53-62) — no YAML
architecture exists there at all. Neither the download nor the torch runtime
is available in this zero-egress TPU build, so this framework goes further
than the reference: the yolo_nas_s architecture itself is implemented
natively (nn/modules/nas.py: QARepVGG / NASStage / NASCSP + the
transposed-conv PAN neck, cfg/models/nas/yolo_nas_s.yaml), making NAS a
real, trainable model family here:

- ``NAS('yolo_nas_s')`` builds the native architecture (random init — train
  it like any detector; super-gradients pretrained weights remain
  unimportable offline, the documented deviation);
- ``NAS(path.ckpt)`` wraps any framework detection checkpoint with the NAS
  facade, matching the reference's predict/val/info surface;
- ``NAS(x.pt)`` raises the same informative constraint the reference raises
  for unavailable pretrained assets.

Prediction/validation route through the standard detect machinery: the
reference's NASPredictor/NASValidator (predict.py:35, val.py:38) exist only
to re-pack super-gradients' pre-decoded (xyxy, scores) output into the
common NMS layout; our Detect head already emits the framework's standard
raw form, so DetectionPredictor/DetectionValidator apply unchanged.
"""

from __future__ import annotations

from pathlib import Path


class NAS:
    """`NAS('yolo_nas_s' | 'model.ckpt')` — YOLO-NAS detection facade
    (reference: models/nas/model.py:26)."""

    def __new__(cls, model: str = "yolo_nas_s"):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        name = str(model)
        suffix = Path(name).suffix
        assert suffix not in {".yaml", ".yml"} or Path(name).stem.startswith("yolo_nas"), (
            "YOLO-NAS models only support the yolo_nas_* architectures."
        )
        if suffix == ".pt":
            raise NotImplementedError(
                "super-gradients pretrained weights are torch-runtime artifacts; this TPU build "
                "builds the architecture natively instead: NAS('yolo_nas_s') then train, or pass "
                "a framework .ckpt."
            )
        if suffix == ".ckpt":
            return YOLO(name, task="detect")
        stem = Path(name).stem
        return YOLO(f"{stem}.yaml", task="detect")
