"""Multi-scale training: batches resize over the static size ladder, each size
compiles once, loss stays finite (reference models/yolo/detect/train.py:19
preprocess_batch; deviation to a fixed ladder documented in engine/trainer.py)."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.engine import trainer as trainer_mod
from spectrogram_yolov11_tpu.engine.trainer import DetectionTrainer, _resize_uint8_batch


def test_resize_uint8_batch():
    imgs = np.random.default_rng(0).integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    out = _resize_uint8_batch(imgs, 96)
    assert out.shape == (3, 96, 96, 3) and out.dtype == np.uint8
    # downscale of a constant image stays constant
    const = np.full((1, 64, 64, 3), 77, np.uint8)
    assert (_resize_uint8_batch(const, 32) == 77).all()


@pytest.mark.slow
def test_multiscale_train_smoke(tmp_path, monkeypatch):
    """1 epoch with multi_scale=True at imgsz 64: the ladder {32, 64, 96} is
    actually drawn from (spied), and the averaged loss is finite."""
    seen = []
    orig = _resize_uint8_batch

    def spy(imgs, size):
        seen.append(size)
        return orig(imgs, size)

    monkeypatch.setattr(trainer_mod, "_resize_uint8_batch", spy)
    t = DetectionTrainer(overrides=dict(
        data="shapes128.yaml", model="yolo11n.yaml", imgsz=64, batch=4, nbs=4, epochs=1,
        workers=0, val=False, save=False, project=str(tmp_path), name="ms", exist_ok=True,
        close_mosaic=0, mosaic=0.0, plots=False, multi_scale=True,
    ))
    t.train()
    assert np.isfinite(list(t.label_loss.values())).all()
    # at least one non-native size was drawn over 16 iters (P(all 64) ~ (1/3)^16)
    assert seen and set(seen) <= {32, 96}


def test_facade_train_rebuilds_for_dataset_nc():
    """YOLO('yolo11n.yaml').train(data=nc-3-set) must rebuild the nc-80 facade
    model for the dataset's class count and graft compatible weights across —
    previously it silently trained the wrong head (reference trainer get_model
    + intersect_dicts)."""
    import numpy as np

    from spectrogram_yolov11_tpu import YOLO
    from spectrogram_yolov11_tpu.engine.trainer import _intersect_variables

    m = YOLO("yolo11n.yaml")
    assert m.model.nc == 80
    res = m.train(data="shapes128.yaml", epochs=1, imgsz=64, batch=2, nbs=2, workers=0,
                  fraction=0.1, val=False, save=False, plots=False, mosaic=0.0, close_mosaic=0)
    assert m.model.nc == 3  # rebuilt for the dataset
    assert np.isfinite(list(res.values())).all()

    # _intersect_variables grafts matching-shape leaves and keeps new-shape ones
    new = {"params": {"a": np.zeros((2, 2)), "b": np.zeros((3,))}}
    old = {"params": {"a": np.ones((2, 2)), "b": np.ones((4,))}}
    out = _intersect_variables(new, old)
    assert (out["params"]["a"] == 1).all() and (out["params"]["b"] == 0).all()
