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


def test_grounding_dataset_and_world_forward(tmp_path):
    """GroundingDataset parses caption/token-span json into per-image phrase
    classes + texts (reference dataset.py:283), and the phrase embeddings
    drive the world model's per-image (B, K, ct) text input to a finite loss."""
    import json
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.data import GroundingDataset
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.ops.losses import detection_loss

    data = check_det_dataset("shapes128.yaml")
    img_dir = Path(data["val"])
    files = sorted(img_dir.glob("*.jpg"))[:2]
    caption = "a red rectangle next to a blue circle"
    ann = {
        "images": [{"id": i, "file_name": f.name, "height": 640, "width": 640, "caption": caption}
                   for i, f in enumerate(files)],
        "annotations": [
            {"image_id": 0, "bbox": [64, 64, 128, 96], "tokens_positive": [[2, 15]], "iscrowd": 0},
            {"image_id": 0, "bbox": [320, 320, 96, 96], "tokens_positive": [[26, 37]], "iscrowd": 0},
            {"image_id": 0, "bbox": [320, 320, 96, 96], "tokens_positive": [[26, 37]], "iscrowd": 0},  # dup drops
            {"image_id": 1, "bbox": [100, 100, 200, 150], "tokens_positive": [[2, 15]], "iscrowd": 0},
            {"image_id": 1, "bbox": [10, 10, 0, 50], "tokens_positive": [[2, 15]], "iscrowd": 0},  # degenerate drops
        ],
    }
    jf = tmp_path / "grounding.json"
    jf.write_text(json.dumps(ann))

    ds = GroundingDataset(img_dir, json_file=jf, imgsz=160, max_gt=8, nc=2)
    assert len(ds) == 2
    item0 = ds.get_item(0, np.random.default_rng(0))
    assert item0["texts"] == ["red rectangle", "blue circle"]
    assert int(item0["mask_gt"].sum()) == 2  # dup dropped
    item1 = ds.get_item(1, np.random.default_rng(0))
    assert item1["texts"] == ["red rectangle"] and int(item1["mask_gt"].sum()) == 1

    # per-image phrase embeddings -> world forward -> finite detection loss
    m = build_model("yolov8s-world.yaml", nc=2, verbose=False, task="world")
    K = 2
    txt = np.stack([
        m.text_embeddings(item0["texts"])[0],
        m.text_embeddings(item1["texts"] + [""])[0],  # pad to K phrases
    ])
    v = m.init(jax.random.PRNGKey(0), imgsz=160)
    imgs = jnp.stack([jnp.asarray(item0["img"]), jnp.asarray(item1["img"])]).astype(jnp.float32) / 255
    out = m.apply(v, imgs, txt_feats=jnp.asarray(txt))
    cls = jnp.stack([jnp.asarray(item0["cls"]), jnp.asarray(item1["cls"])])
    boxes = jnp.stack([jnp.asarray(item0["bboxes"]), jnp.asarray(item1["bboxes"])])
    mask = jnp.stack([jnp.asarray(item0["mask_gt"]), jnp.asarray(item1["mask_gt"])])
    total, items = detection_loss(out, cls, boxes, mask, nc=K, imgsz=160,
                                  strides=tuple(float(s) for s in m.stride))
    assert bool(jnp.isfinite(total))


import pytest


@pytest.mark.slow
def test_grounding_trainer_smoke(tmp_path):
    """1 epoch of phrase-grounded world training: per-image text embeddings
    ship with the batch, loss is finite (reference train_world.py)."""
    import json
    from pathlib import Path

    from spectrogram_yolov11_tpu.engine.trainer import GroundingTrainer

    data = check_det_dataset("shapes128.yaml")
    img_dir = Path(data["val"])
    files = sorted(img_dir.glob("*.jpg"))[:8]
    caption = "a wideband burst and a narrow carrier"
    ann = {
        "images": [{"id": i, "file_name": f.name, "height": 640, "width": 640, "caption": caption}
                   for i, f in enumerate(files)],
        "annotations": [
            {"image_id": i, "bbox": [64 + 8 * i, 64, 128, 96],
             "tokens_positive": [[2, 16]] if i % 2 == 0 else [[23, 37]], "iscrowd": 0}
            for i in range(len(files))
        ],
    }
    jf = tmp_path / "g.json"
    jf.write_text(json.dumps(ann))

    t = GroundingTrainer(overrides=dict(
        model="yolov8s-world.yaml", img_path=str(img_dir), json_file=str(jf), max_phrases=4,
        imgsz=96, batch=4, nbs=4, epochs=1, workers=0, save=False,
        project=str(tmp_path), name="ground", exist_ok=True, plots=False, close_mosaic=0,
    ))
    t.train()
    assert np.isfinite(list(t.label_loss.values())).all()


def test_disk_cache_sidecars(tmp_path):
    """cache='disk' stores decoded .npy sidecars and reloads from them
    (reference: data/base.py:189 cache_images disk mode)."""
    import shutil
    from pathlib import Path

    data = check_det_dataset("shapes128.yaml")
    src = Path(data["val"])
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(), lbl_dir.mkdir()
    for f in sorted(src.glob("*.jpg"))[:2]:
        shutil.copy2(f, img_dir / f.name)
        lbl = Path(str(f).replace("images", "labels")).with_suffix(".txt")
        if lbl.exists():
            shutil.copy2(lbl, lbl_dir / lbl.name)
    ds = YOLODataset(str(img_dir), imgsz=96, augment=False, nc=data["nc"], max_gt=16, cache="disk")
    a = ds.load_image(0)
    assert (img_dir / Path(ds.im_files[0]).with_suffix(".npy").name).exists()
    b = ds.load_image(0)  # second load comes from the sidecar
    np.testing.assert_array_equal(a, b)
