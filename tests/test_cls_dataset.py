import numpy as np
import numpy as np

def test_check_cls_dataset_synthesizes(tmp_path, monkeypatch):
    """Missing classify dataset synthesizes folder-per-class shapes
    (reference data/utils.py:394 check_cls_dataset, minus downloads)."""
    from spectrogram_yolov11_tpu.data import check_cls_dataset
    import spectrogram_yolov11_tpu.data.dataset as ds_mod
    from spectrogram_yolov11_tpu.utils import SETTINGS

    monkeypatch.setitem(SETTINGS, "datasets_dir", str(tmp_path))
    info = check_cls_dataset("cls-smoke")
    assert info["nc"] == 3 and set(info["names"].values()) == {"rectangle", "circle", "triangle"}
    from pathlib import Path
    assert len(list(Path(info["train"]).rglob("*.jpg"))) == 96
    assert len(list(Path(info["val"]).rglob("*.jpg"))) == 24
    # second call resolves the existing folder without regenerating
    info2 = check_cls_dataset("cls-smoke")
    assert info2["train"] == info["train"]


def test_classification_dataset_transforms(tmp_path, monkeypatch):
    """Train path applies RandomResizedCrop/flip/HSV/erasing; val path is a
    deterministic center crop (reference augment.py:2346,2403)."""
    from spectrogram_yolov11_tpu.data import ClassificationDataset, check_cls_dataset
    from spectrogram_yolov11_tpu.utils import SETTINGS

    monkeypatch.setitem(SETTINGS, "datasets_dir", str(tmp_path))
    info = check_cls_dataset("cls-aug")
    train = ClassificationDataset(info["train"], imgsz=96, augment=True)
    val = ClassificationDataset(info["val"], imgsz=96, augment=False)
    a = train.get_item(0, np.random.default_rng(0))
    b = train.get_item(0, np.random.default_rng(1))
    assert a["img"].shape == (96, 96, 3) and a["img"].dtype == np.uint8
    assert not np.array_equal(a["img"], b["img"])  # stochastic train path
    v1 = val.get_item(0, np.random.default_rng(0))
    v2 = val.get_item(0, np.random.default_rng(7))
    np.testing.assert_array_equal(v1["img"], v2["img"])  # deterministic val path
    assert int(a["cls"]) == int(train.samples[0][1])


def test_classify_train_smoke(tmp_path, monkeypatch):
    """1 epoch of classification training over the synthetic set: finite loss,
    top1 accuracy computed (reference models/yolo/classify/train.py)."""
    from spectrogram_yolov11_tpu.engine.classify import ClassificationTrainer
    from spectrogram_yolov11_tpu.data import check_cls_dataset
    from spectrogram_yolov11_tpu.utils import SETTINGS

    monkeypatch.setitem(SETTINGS, "datasets_dir", str(tmp_path))
    info = check_cls_dataset("cls-train")
    t = ClassificationTrainer(overrides=dict(
        model="yolo11n-cls.yaml", data=str(tmp_path / "cls-train"), imgsz=64, batch=8,
        epochs=1, workers=0, project=str(tmp_path), name="cls", exist_ok=True, plots=False))
    metrics = t.train()
    assert np.isfinite(list(metrics.values())).all()
