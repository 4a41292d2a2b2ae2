"""Bboxes/Instances containers vs the torch reference (utils/instance.py)."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.utils.instance import Bboxes, Instances, resample_segments

torch = pytest.importorskip("torch")


def _ref():
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.instance import Bboxes as RB, Instances as RI

    return RB, RI


def _rand_instances(cls, rng, n=6, kpts=True, fmt="xywh", normalized=False, seg_len=8):
    boxes = rng.uniform(10, 90, (n, 4)).astype(np.float32)
    # the reference contract is a dense (N, S, 2) segments array (lists are a
    # local extension that resamples on entry)
    segs = rng.uniform(0, 100, (n, seg_len, 2)).astype(np.float32)
    kp = rng.uniform(0, 100, (n, 5, 3)).astype(np.float32) if kpts else None
    return cls(boxes.copy(), segs.copy(), None if kp is None else kp.copy(),
               bbox_format=fmt, normalized=normalized)


def test_bboxes_parity():
    RB, _ = _ref()
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 100, (7, 4)).astype(np.float32)

    for src in ("xyxy", "xywh", "ltwh"):
        for dst in ("xyxy", "xywh", "ltwh"):
            ours = Bboxes(b.copy(), src)
            ref = RB(b.copy(), src)
            ours.convert(dst)
            ref.convert(dst)
            np.testing.assert_allclose(ours.bboxes, ref.bboxes, atol=1e-5)
            np.testing.assert_allclose(ours.areas(), ref.areas(), atol=1e-4)

    ours, ref = Bboxes(b.copy()), RB(b.copy())
    ours.mul((2.0, 0.5, 2.0, 0.5)); ref.mul((2.0, 0.5, 2.0, 0.5))
    ours.add(3.0); ref.add(3.0)
    np.testing.assert_allclose(ours.bboxes, ref.bboxes, atol=1e-5)
    cat_o = Bboxes.concatenate([ours, ours[2:4]])
    cat_r = RB.concatenate([ref, ref[2:4]])
    np.testing.assert_allclose(cat_o.bboxes, cat_r.bboxes, atol=1e-5)


def test_resample_segments_parity():
    from ultralytics.utils.ops import resample_segments as ref_resample

    _ref()
    rng = np.random.default_rng(1)
    segs = [rng.uniform(0, 50, (m, 2)).astype(np.float32) for m in (5, 12, 1000)]
    ours = resample_segments([s.copy() for s in segs], n=1000)
    ref = ref_resample([s.copy() for s in segs], n=1000)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, atol=1e-4)


def test_instances_transform_parity():
    _, RI = _ref()
    rng = np.random.default_rng(2)
    ours = _rand_instances(Instances, np.random.default_rng(2))
    ref = _rand_instances(RI, np.random.default_rng(2))

    for o, r in ((ours, ref),):
        for op in (lambda i: i.convert_bbox("xyxy"),
                   lambda i: i.scale(1.5, 0.75),
                   lambda i: i.add_padding(7, 11),
                   lambda i: i.fliplr(160),
                   lambda i: i.flipud(120),
                   lambda i: i.clip(160, 120),
                   lambda i: i.normalize(160, 120),
                   lambda i: i.denormalize(160, 120)):
            op(o)
            op(r)
            np.testing.assert_allclose(o.bboxes, r.bboxes, atol=1e-4)
            np.testing.assert_allclose(o.segments, r.segments, atol=1e-4)
            np.testing.assert_allclose(o.keypoints, r.keypoints, atol=1e-4)

    good_o = ours.remove_zero_area_boxes()
    good_r = ref.remove_zero_area_boxes()
    np.testing.assert_array_equal(good_o, good_r)
    assert len(ours) == len(ref)

    sub_o, sub_r = ours[1:3], ref[1:3]
    np.testing.assert_allclose(sub_o.bboxes, sub_r.bboxes, atol=1e-4)
    cat_o = Instances.concatenate([ours, sub_o])
    cat_r = RI.concatenate([ref, sub_r])
    np.testing.assert_allclose(cat_o.bboxes, cat_r.bboxes, atol=1e-4)
    np.testing.assert_allclose(cat_o.segments, cat_r.segments, atol=1e-4)
