"""Multi-task smoke tests: seg/pose/obb/cls models build, forward, and their
losses produce finite values+gradients on fabricated batches (fast; the full
train->val->predict loop per task runs in the slow e2e smoke)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogram_yolov11_tpu.nn.tasks import build_model, yaml_model_load
from spectrogram_yolov11_tpu.ops.losses import obb_loss, pose_loss, segmentation_loss

IMGSZ = 64


def _batch(rng, b=2, max_gt=6, nc=3):
    return (
        jnp.asarray(rng.integers(0, nc, (b, max_gt)).astype(np.int32)),
        jnp.asarray(rng.uniform(0.3, 0.6, (b, max_gt, 4)).astype(np.float32)),
        jnp.asarray(np.ones((b, max_gt), bool)),
    )


def test_segmentation_model_and_loss():
    m = build_model("yolo11n-seg.yaml", nc=3, verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, IMGSZ, IMGSZ, 3))
    feats, mc, proto = m.apply(v, x)
    assert mc.shape[-1] == 32 and proto.shape[-1] == 32
    assert proto.shape[1] == IMGSZ // 4
    rng = np.random.default_rng(0)
    cls, boxes, mask = _batch(rng)
    gt_masks = jnp.asarray(rng.integers(0, 3, (2, IMGSZ // 4, IMGSZ // 4)).astype(np.int32))
    total, items = segmentation_loss(feats, mc, proto, cls, boxes, mask, gt_masks, nc=3, imgsz=IMGSZ,
                                     strides=tuple(float(s) for s in m.stride), max_fg=16)
    assert np.isfinite(float(total)) and items.shape == (4,)


def test_pose_model_and_loss():
    d = yaml_model_load("yolo11n-pose.yaml")
    d["kpt_shape"] = [5, 3]
    m = build_model(d, nc=1, verbose=False, task="pose")
    v = m.init(jax.random.PRNGKey(0))
    feats, kpt_raw = m.apply(v, jnp.zeros((2, IMGSZ, IMGSZ, 3)))
    assert kpt_raw.shape[-1] == 15
    rng = np.random.default_rng(1)
    cls, boxes, mask = _batch(rng, nc=1)
    kpts = jnp.asarray(rng.uniform(0.2, 0.8, (2, 6, 5, 3)).astype(np.float32))
    total, items = pose_loss(feats, kpt_raw, cls, boxes, mask, kpts, nc=1, kpt_shape=(5, 3), imgsz=IMGSZ,
                             strides=tuple(float(s) for s in m.stride))
    assert np.isfinite(float(total)) and items.shape == (5,)


def test_obb_model_and_loss():
    m = build_model("yolo11n-obb.yaml", nc=2, verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    feats, angle_raw = m.apply(v, jnp.zeros((2, IMGSZ, IMGSZ, 3)))
    assert angle_raw.shape[-1] == 1
    rng = np.random.default_rng(2)
    cls, boxes4, mask = _batch(rng, nc=2)
    rboxes = jnp.concatenate([boxes4, jnp.asarray(rng.uniform(-0.5, 0.5, (2, 6, 1)).astype(np.float32))], -1)
    total, items = obb_loss(feats, angle_raw, cls, rboxes, mask, nc=2, imgsz=IMGSZ,
                            strides=tuple(float(s) for s in m.stride))
    assert np.isfinite(float(total)) and items.shape == (3,)


def test_classify_model():
    m = build_model("yolo11n-cls.yaml", nc=10, verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    logits = m.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 10)


def test_task_dataset_formats(tmp_path):
    """Per-task label parsing + transform plumbing over the synthetic sets."""
    from spectrogram_yolov11_tpu.data import YOLODataset, check_det_dataset
    from spectrogram_yolov11_tpu.utils import DEFAULT_CFG

    for yaml_name, task, extra_key in [
        ("shapes128-seg.yaml", "segment", "masks"),
        ("shapes128-pose.yaml", "pose", "keypoints"),
        ("shapes128-obb.yaml", "obb", None),
    ]:
        data = check_det_dataset(yaml_name)
        ds = YOLODataset(data["val"], imgsz=160, augment=False, nc=data["nc"], max_gt=32, task=task,
                         kpt_shape=data.get("kpt_shape", (17, 3)))
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["img"].shape == (160, 160, 3)
        if extra_key:
            assert extra_key in item
        if task == "obb":
            assert item["bboxes"].shape == (32, 5)
        # train transform with mosaic
        ds_t = YOLODataset(data["train"], imgsz=160, augment=True, hyp=DEFAULT_CFG, nc=data["nc"],
                           max_gt=32, task=task, kpt_shape=data.get("kpt_shape", (17, 3)))
        item_t = ds_t.get_item(0, np.random.default_rng(1))
        assert item_t["img"].shape == (160, 160, 3)


def test_copy_paste_augmentation():
    from spectrogram_yolov11_tpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    # one instance on the left half -> its mirror lands free of overlaps
    seg = np.array([[20, 50], [60, 50], [60, 110], [20, 110]], np.float32)
    sample = {
        "img": img,
        "cls": np.array([1], np.int32),
        "bboxes": np.array([[20, 50, 60, 110]], np.float32),
        "segments": [seg],
    }
    out = copy_paste(sample, p=1.0, rng=rng)
    assert len(out["cls"]) == 2
    assert len(out["segments"]) == 2
    np.testing.assert_allclose(out["bboxes"][1], [140, 50, 180, 110])
    # pasted pixels come from the mirrored image
    assert not np.array_equal(out["img"], img)


def test_info_reports_gflops():
    """model.info includes XLA-measured GFLOPs (reference get_flops,
    torch_utils.py:364)."""
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    msg = m.info(v, imgsz=128)
    assert "GFLOPs" in msg
    g = m.get_flops(v, imgsz=128)
    # yolo11n is ~6.5 GFLOPs @640 -> ~0.26 @128 (quadratic in imgsz)
    assert g is not None and 0.15 < g < 0.45, g


def test_per_layer_profile():
    """Per-layer params/FLOPs/ms replay (reference _profile_one_layer,
    nn/tasks.py:198)."""
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    rows = m.profile(v, imgsz=96, timed=False)
    assert len(rows) == len(m.specs)
    total_params = sum(r["params"] for r in rows)
    import numpy as np

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert total_params == n_params
    assert sum(r["gflops"] for r in rows) > 0.05


def test_embed_facade():
    """model.embed returns per-image pooled embeddings (reference
    engine/model.py:456, tests/test_python.py:566)."""
    import numpy as np

    from spectrogram_yolov11_tpu.engine.model import YOLO

    y = YOLO("yolo11n.yaml")
    img = np.random.randint(0, 255, (96, 128, 3), np.uint8)
    e = y.embed([img, img], imgsz=64)
    assert len(e) == 2 and e[0].ndim == 1 and np.isfinite(e[0]).all()
    e2 = y.embed([img], embed=[4, 6], imgsz=64)
    assert e2[0].shape[0] == 64 + 192  # concat of pooled P3/P4-ish channels
