"""YOLOConcatDataset / YOLOMultiModalDataset / HUBDatasetStats
(reference dataset.py:251,358; data/utils.py:472)."""

import numpy as np

from spectrogram_yolov11_tpu.data import (
    HUBDatasetStats,
    YOLOConcatDataset,
    YOLODataset,
    YOLOMultiModalDataset,
    check_det_dataset,
)


def test_concat_dataset_indexing():
    data = check_det_dataset("shapes128.yaml")
    a = YOLODataset(data["val"], imgsz=96, augment=False, nc=data["nc"], max_gt=16)
    b = YOLODataset(data["train"], imgsz=96, augment=False, nc=data["nc"], max_gt=16)
    cat = YOLOConcatDataset([a, b])
    assert len(cat) == len(a) + len(b)
    assert len(cat.im_files) == len(cat)
    rng = np.random.default_rng(0)
    first = cat.get_item(0, rng)
    wrapped = cat.get_item(len(a), rng)  # first item of b
    ref = b.get_item(0, rng)
    assert first["img"].shape == wrapped["img"].shape == ref["img"].shape
    np.testing.assert_array_equal(wrapped["img"], ref["img"])
    cat.close_mosaic()  # no-op for non-augmented members


def test_multimodal_dataset_texts():
    data = check_det_dataset("shapes128.yaml")
    ds = YOLOMultiModalDataset(data["val"], imgsz=96, augment=False, nc=data["nc"], max_gt=16,
                               names=data["names"])
    item = ds.get_item(0, np.random.default_rng(0))
    assert item["texts"] == ["rectangle", "circle", "triangle"]


def test_hub_dataset_stats(tmp_path):
    stats = HUBDatasetStats("shapes128.yaml").get_json(save=True)
    assert stats["nc"] == 3 and stats["test"] is None
    val = stats["val"]
    assert val["image_stats"]["total"] == 16
    assert val["instance_stats"]["total"] == sum(val["instance_stats"]["per_class"])
    assert len(val["labels"]) == 16
    from pathlib import Path

    assert (Path("datasets/shapes128") / "stats.json").exists()
