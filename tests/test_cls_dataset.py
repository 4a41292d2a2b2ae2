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
