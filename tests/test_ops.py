"""ops layer tests: box math round-trips, IoU parity, NMS parity vs reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.ops.boxes import clip_boxes, scale_boxes, xywh2xyxy, xyxy2xywh, xywhn2xyxy
from spectrogram_yolov11_tpu.ops.iou import bbox_iou, box_iou
from spectrogram_yolov11_tpu.ops.nms import non_max_suppression

torch = pytest.importorskip("torch")


def _rand_preds(rng, b=2, a=400, nc=6, imgsz=320, hot=25):
    """Synthetic decoded predictions (B, A, 4+nc) with a few confident boxes."""
    cx = rng.uniform(20, imgsz - 20, (b, a))
    cy = rng.uniform(20, imgsz - 20, (b, a))
    w = rng.uniform(8, 80, (b, a))
    h = rng.uniform(8, 80, (b, a))
    scores = rng.uniform(0, 0.02, (b, a, nc))
    for bi in range(b):
        idx = rng.choice(a, hot, replace=False)
        scores[bi, idx, rng.integers(0, nc, hot)] = rng.uniform(0.3, 0.99, hot)
    return np.stack([cx, cy, w, h], -1).astype(np.float32), scores.astype(np.float32)


def test_box_roundtrip():
    rng = np.random.default_rng(0)
    xywh = rng.uniform(10, 100, (50, 4)).astype(np.float32)
    back = xyxy2xywh(xywh2xyxy(xywh))
    np.testing.assert_allclose(back, xywh, atol=1e-5)


def test_bbox_iou_parity_with_reference():
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.metrics import bbox_iou as t_iou

    rng = np.random.default_rng(1)
    b1 = rng.uniform(10, 200, (64, 4)).astype(np.float32)
    b2 = (b1 + rng.normal(0, 12, (64, 4))).astype(np.float32)
    for kw in ({}, {"GIoU": True}, {"DIoU": True}, {"CIoU": True}):
        ref = t_iou(torch.from_numpy(b1), torch.from_numpy(b2), xywh=True, **kw).squeeze(-1).numpy()
        ours = np.asarray(bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=True, **kw))
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=str(kw))


@pytest.mark.parametrize("multi_label", [False, True])
@pytest.mark.parametrize("agnostic", [False])
def test_nms_parity_with_reference(multi_label, agnostic):
    """Our fixed-shape greedy NMS keeps exactly the reference keep-set."""
    from oracle import load_reference

    load_reference()
    from ultralytics.utils import ops as t_ops

    rng = np.random.default_rng(7)
    boxes, scores = _rand_preds(rng)
    preds = np.concatenate([boxes, scores], -1)  # (B, A, 4+nc)
    conf, iou_t = 0.25, 0.45

    # NB: the reference NMS mutates its input in place (xywh2xyxy on a view),
    # so give torch a copy — from_numpy would share memory with `preds`.
    ref_in = torch.from_numpy(preds.transpose(0, 2, 1).copy())  # reference wants (B, 4+nc, A)
    ref_out = t_ops.non_max_suppression(
        ref_in, conf_thres=conf, iou_thres=iou_t, multi_label=multi_label, agnostic=agnostic, max_det=50
    )
    out, n_valid = non_max_suppression(
        jnp.asarray(preds), conf_thres=conf, iou_thres=iou_t, nc=6,
        multi_label=multi_label, agnostic=agnostic, max_det=50, pre_nms_topk=512,
    )
    out = np.asarray(out)
    for bi, r in enumerate(ref_out):
        r = r.numpy()  # (n, 6) xyxy conf cls
        n = int(n_valid[bi])
        assert n == len(r), f"batch {bi}: ours {n} vs ref {len(r)}"
        ours = out[bi, :n]
        # same order (score desc); tolerate fp jitter
        np.testing.assert_allclose(ours[:, 4], r[:, 4], atol=1e-5)
        np.testing.assert_allclose(ours[:, :4], r[:, :4], atol=1e-2)
        np.testing.assert_array_equal(ours[:, 5].astype(int), r[:, 5].astype(int))


def test_nms_empty_and_padding():
    preds = np.zeros((1, 100, 10), np.float32)
    preds[..., 2:4] = 10.0  # nonzero wh
    out, n = non_max_suppression(jnp.asarray(preds), conf_thres=0.25, nc=6, max_det=30, pre_nms_topk=64)
    assert int(n[0]) == 0
    assert out.shape == (1, 30, 6)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)


def test_scale_boxes_letterbox_inverse():
    # 480x640 image letterboxed to 320x320: gain=0.5, pad=(0, 40)
    boxes = np.array([[100.0, 60.0, 200.0, 120.0]], np.float32)
    scaled = scale_boxes((320, 320), boxes.copy(), (480, 640))
    np.testing.assert_allclose(scaled, [[200.0, 40.0, 400.0, 160.0]], atol=0.5)


def test_regularize_rboxes_parity():
    """Canonical xywhr form matches the reference (ops.py:791)."""
    import numpy as np
    import torch
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.ops import regularize_rboxes as ref_reg

    from spectrogram_yolov11_tpu.ops.boxes import regularize_rboxes

    rng = np.random.default_rng(0)
    rb = np.concatenate([rng.uniform(0, 100, (32, 4)), rng.uniform(-3, 3, (32, 1))], -1).astype(np.float32)
    ours = np.asarray(regularize_rboxes(rb))
    ref = ref_reg(torch.from_numpy(rb)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_masks2segments_parity_single_contour():
    """Single-contour masks match the reference exactly (ops.py:809)."""
    import cv2
    import numpy as np
    import torch
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.ops import masks2segments as ref_m2s

    from spectrogram_yolov11_tpu.data.converter import masks2segments

    m = np.zeros((2, 64, 64), np.uint8)
    cv2.circle(m[0], (30, 30), 12, 1, -1)
    cv2.rectangle(m[1], (10, 20), (50, 44), 1, -1)
    ours = masks2segments(m)
    ref = ref_m2s(torch.from_numpy(m))
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r)
    # multi-contour: ours joins by nearest-neighbor chain; must include all points
    m2 = np.zeros((1, 64, 64), np.uint8)
    cv2.circle(m2[0], (15, 15), 6, 1, -1)
    cv2.circle(m2[0], (45, 45), 6, 1, -1)
    (seg,) = masks2segments(m2)
    assert len(seg) > 10 and np.isfinite(seg).all()
    (largest,) = masks2segments(m2, strategy="largest")
    assert len(largest) <= len(seg)


def test_clip_boxes_preserves_trailing_columns():
    """clip_boxes keeps conf/cls columns (round-1 advisor finding; reference
    ops.py:335 semantics)."""
    import numpy as np

    from spectrogram_yolov11_tpu.ops.boxes import clip_boxes, xyxy2xywhn

    det = np.array([[-5.0, -3.0, 120.0, 90.0, 0.9, 2.0]], np.float32)
    out = np.asarray(clip_boxes(det, (80, 100)))
    np.testing.assert_allclose(out[0], [0, 0, 100, 80, 0.9, 2.0])
    n = np.asarray(xyxy2xywhn(det, w=100, h=80, clip=True))
    assert n.shape == (1, 6) and n[0, 4] == np.float32(0.9) and n[0, 5] == 2.0
    assert (n[0, :4] <= 1.0).all() and (n[0, :4] >= 0.0).all()
