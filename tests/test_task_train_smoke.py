"""1-epoch train smokes for segment/pose/obb: full trainer loop (jitted step,
EMA, val, checkpointing) per task plug-in (reference models/yolo/{segment,
pose,obb}/train.py). Detect/classify/world/rtdetr/v10 smokes live elsewhere."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.engine.trainer import TASK2TRAINER


@pytest.mark.slow
@pytest.mark.parametrize("task,data,model", [
    ("segment", "shapes128-seg.yaml", "yolo11n-seg.yaml"),
    ("pose", "shapes128-pose.yaml", "yolo11n-pose.yaml"),
    ("obb", "shapes128-obb.yaml", "yolo11n-obb.yaml"),
    # the native YOLO-NAS architecture through the standard detect trainer
    ("detect", "shapes128.yaml", "yolo_nas_s.yaml"),
])
def test_task_train_smoke(tmp_path, task, data, model):
    t = TASK2TRAINER[task](overrides=dict(
        data=data, model=model, imgsz=96, batch=4, nbs=4, epochs=1, workers=0,
        fraction=0.25, val=True, save=True, project=str(tmp_path), name=task,
        exist_ok=True, close_mosaic=0, mosaic=0.0, plots=False,
    ))
    t.train()
    assert np.isfinite(list(t.label_loss.values())).all()
    assert t.last.exists()
    assert np.isfinite(list(t.metrics.values())).all()
