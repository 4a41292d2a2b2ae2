"""Drop-in dataset-config surface (reference: ultralytics/cfg/datasets/, 35 yamls).

Sweeps every packaged dataset yaml for schema sanity and nc parity with the
reference surface, then runs a few end-to-end: resolve → synthesize → build a
dataset → pull one sample (detect / pose-with-coco-kpt-shape / obb /
multi-dir-train / classify-from-yaml / the fork's own Spectrogram.yaml).
"""

from pathlib import Path

import numpy as np
import pytest
import yaml

from spectrogram_yolov11_tpu.cfg import find_dataset_yaml
from spectrogram_yolov11_tpu.data.dataset import YOLODataset, check_cls_dataset, check_det_dataset

CFG_DIR = Path("spectrogram_yolov11_tpu/cfg/datasets")
ALL_YAMLS = sorted(p.name for p in CFG_DIR.glob("*.yaml"))

# reference class counts (spot anchors, reference: ultralytics/cfg/datasets/*)
EXPECTED_NC = {
    "coco8.yaml": 80, "coco.yaml": 80, "coco128.yaml": 80, "lvis.yaml": 1203,
    "Objects365.yaml": 365, "open-images-v7.yaml": 601, "ImageNet.yaml": 1000,
    "VOC.yaml": 20, "xView.yaml": 60, "VisDrone.yaml": 10, "DOTAv1.yaml": 15,
    "DOTAv1.5.yaml": 16, "dota8.yaml": 15, "Spectrogram.yaml": 2,
    "Spectrogram_lap.yaml": 2, "coco8-pose.yaml": 1, "hand-keypoints.yaml": 1,
    "SKU-110K.yaml": 1, "GlobalWheat2020.yaml": 1, "Argoverse.yaml": 8,
}
POSE_KPTS = {"coco8-pose.yaml": 17, "coco-pose.yaml": 17, "tiger-pose.yaml": 12,
             "dog-pose.yaml": 24, "hand-keypoints.yaml": 21}


def test_reference_dataset_surface_complete():
    """Every reference dataset yaml resolves by name here."""
    ref_names = sorted(p.name for p in Path("/root/reference/ultralytics/cfg/datasets").glob("*.yaml"))
    missing = [n for n in ref_names if not (CFG_DIR / n).exists()]
    assert not missing, f"missing drop-in dataset configs: {missing}"


@pytest.mark.parametrize("name", ALL_YAMLS)
def test_yaml_schema(name):
    spec = yaml.safe_load((CFG_DIR / name).read_text())
    assert spec.get("names"), name
    names = spec["names"]
    nc = len(names)
    if name in EXPECTED_NC:
        assert nc == EXPECTED_NC[name], f"{name}: nc {nc} != {EXPECTED_NC[name]}"
    if name in POSE_KPTS:
        assert spec["kpt_shape"][0] == POSE_KPTS[name]
        if spec.get("flip_idx"):
            assert sorted(spec["flip_idx"]) == list(range(spec["kpt_shape"][0]))
    assert spec.get("train") and spec.get("val")
    assert find_dataset_yaml(name).exists()


def _one_sample(data, task, **kw):
    ds = YOLODataset(data["train"], imgsz=320, augment=False, nc=data["nc"], task=task, **kw)
    s = ds.get_item(0, np.random.default_rng(0))
    assert np.isfinite(s["img"]).all()
    return ds, s


def test_coco8_end_to_end(tmp_path, monkeypatch):
    data = check_det_dataset("coco8.yaml")
    assert data["nc"] == 80
    ds, s = _one_sample(data, "detect")
    assert (s["cls"][s["mask_gt"] > 0] < 80).all()


def test_coco8_pose_real_kpt_shape():
    data = check_det_dataset("coco8-pose.yaml")
    ds, s = _one_sample(data, "pose", kpt_shape=tuple(data["kpt_shape"]))
    assert s["keypoints"].shape[-2:] == (17, 3)


def test_dota8_obb():
    data = check_det_dataset("dota8.yaml")
    assert data["nc"] == 15
    _one_sample(data, "obb")


def test_multidir_train_list():
    """yolo_params.yaml: list-of-dirs train paths (reference surface)."""
    data = check_det_dataset("yolo_params.yaml")
    assert isinstance(data["train"], list) and len(data["train"]) == 2
    ds, _ = _one_sample(data, "detect")
    roots = {Path(f).parents[2].name for f in ds.im_files}
    assert roots == {"clutter", "no_clutter"}


def test_spectrogram_fork_config():
    """The fork's own headline config runs out of the box."""
    data = check_det_dataset("Spectrogram.yaml")
    assert [data["names"][i] for i in range(2)] == ["LTE", "RF"]
    _one_sample(data, "detect")


def test_cls_dataset_from_yaml(tmp_path):
    """check_cls_dataset accepts a dataset yaml and synthesizes its schema."""
    spec = {"path": str(tmp_path / "tiny-cls"), "train": "train", "val": "val",
            "synthetic": "cls-shapes", "n_per_class": 2, "gen_imgsz": 64,
            "names": ["alpha", "beta", "gamma", "delta"]}
    f = tmp_path / "tiny-cls.yaml"
    f.write_text(yaml.safe_dump(spec))
    data = check_cls_dataset(str(f))
    assert data["nc"] == 4
    assert sorted(data["names"].values()) == ["alpha", "beta", "delta", "gamma"]
    assert Path(data["train"]).exists() and Path(data["val"]).exists()
