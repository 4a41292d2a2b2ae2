"""Sliced (SAHI-style) inference example: merge logic + e2e over the tiler
(examples/python/sliced_inference.py; reference counterpart:
examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "examples" / "python"))

from sliced_inference import merge_window_detections, predict_sliced  # noqa: E402


def test_merge_dedupes_across_overlapping_windows():
    # same physical object seen by two overlapping windows at full-image
    # (100..160, 10..40): window A at x=0, window B at x=80
    windows = np.asarray([[0, 0, 160, 64], [80, 0, 240, 64]], np.int64)
    det_a = np.asarray([[100, 10, 160, 40, 0.9, 0.0]], np.float32)  # window coords == image coords
    det_b = np.asarray([[21, 11, 79, 39, 0.8, 0.0]], np.float32)  # offset by x=80 -> ~same box
    merged = merge_window_detections([det_a, det_b], windows, iou_thres=0.5, conf_thres=0.25)
    assert merged.shape == (1, 6)
    assert merged[0, 4] == pytest.approx(0.9)
    np.testing.assert_allclose(merged[0, :4], [100, 10, 160, 40], atol=1e-5)


def test_merge_keeps_different_classes_and_disjoint_boxes():
    windows = np.asarray([[0, 0, 100, 100]], np.int64)
    det = np.asarray(
        [
            [10, 10, 30, 30, 0.9, 0.0],
            [12, 11, 31, 29, 0.8, 1.0],  # overlaps but other class -> kept
            [60, 60, 90, 90, 0.7, 0.0],  # disjoint -> kept
            [11, 10, 30, 31, 0.6, 0.0],  # duplicate of first -> suppressed
        ],
        np.float32,
    )
    merged = merge_window_detections([det], windows, iou_thres=0.5, conf_thres=0.25)
    assert len(merged) == 3


def test_merge_conf_gate_and_empty():
    windows = np.asarray([[0, 0, 64, 64], [64, 0, 128, 64]], np.int64)
    low = np.asarray([[1, 1, 10, 10, 0.1, 0.0]], np.float32)
    assert merge_window_detections([low, None], windows).shape == (0, 6)
    assert merge_window_detections([None, None], windows).shape == (0, 6)


@pytest.mark.skipif(
    not (Path(__file__).parents[1] / "runs_artifacts" / "spectrogram_yolo11n.ckpt").exists(),
    reason="trained flagship ckpt not present",
)
def test_sliced_predict_wide_spectrogram():
    """A wide (1280x640) frame tiles into overlapping 640-windows; merged
    detections come back in full-image coordinates."""
    import cv2

    from spectrogram_yolov11_tpu.engine.model import YOLO

    root = Path(__file__).parents[1]
    val = sorted((root / "datasets" / "spectrogram_synth" / "images" / "val").glob("*.jpg"))
    if not val:
        pytest.skip("synthetic val images not materialized")
    im = cv2.imread(str(val[0]))
    wide = cv2.resize(im, (1280, 640), interpolation=cv2.INTER_LINEAR)
    model = YOLO(str(root / "runs_artifacts" / "spectrogram_yolo11n.ckpt"))
    dets, windows = predict_sliced(model, wide, window=640, gap=128, conf=0.25)
    assert len(windows) >= 2
    assert len(dets) >= 1
    assert (dets[:, 0] >= 0).all() and (dets[:, 2] <= 1280 + 1).all()
    assert (dets[:, 1] >= 0).all() and (dets[:, 3] <= 640 + 1).all()
    assert (dets[:, 2] > dets[:, 0]).all() and (dets[:, 3] > dets[:, 1]).all()
