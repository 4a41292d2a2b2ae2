"""Native C++ preprocessing library vs numpy/cv2 references."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.utils.native import (
    NativeBatchLetterbox,
    load_native,
    native_frame_iq,
    native_greedy_nms,
)


def test_native_lib_builds_and_loads():
    assert load_native() is not None, "g++ is in this image; the native lib must build"


def test_native_letterbox_matches_cv2():
    from spectrogram_yolov11_tpu.data.augment import letterbox

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (240, 320, 3), dtype=np.uint8),
              rng.integers(0, 255, (400, 200, 3), dtype=np.uint8)]
    lb = NativeBatchLetterbox(batch=2, imgsz=160)
    buf, geom = lb(frames)
    for i, f in enumerate(frames):
        ref, (r, _), (dw, dh) = letterbox(f, (160, 160))
        assert geom[i][0] == pytest.approx(r, abs=1e-6)
        # bilinear impls differ by at most a rounding LSB; compare loosely
        diff = np.abs(buf[i].astype(int) - ref.astype(int))
        assert float(diff.mean()) < 2.0, f"mean abs diff {diff.mean()}"
        assert np.array_equal(buf[i][:10, :10], ref[:10, :10]) or diff.max() <= 30


def test_native_nms_matches_python():
    rng = np.random.default_rng(1)
    n = 200
    boxes = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(10, 60, (n, 2)).astype(np.float32)], 1)
    scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
    keep_native = native_greedy_nms(boxes, scores, 0.45, 0.1)

    from spectrogram_yolov11_tpu.ops.metrics import box_iou_np

    dead = np.zeros(n, bool)
    keep_ref = np.zeros(n, bool)
    for i in range(n):
        if dead[i] or scores[i] <= 0.1:
            continue
        keep_ref[i] = True
        iou = box_iou_np(boxes[i : i + 1], boxes)[0]
        dead |= iou > 0.45
        dead[i] = True  # self
    np.testing.assert_array_equal(keep_native, keep_ref)


def test_native_iq_framing_matches_numpy():
    rng = np.random.default_rng(2)
    iq = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    out = native_frame_iq(iq, n_fft=256, hop=128)
    idx = np.arange(1 + (4096 - 256) // 128)[:, None] * 128 + np.arange(256)[None, :]
    ref = (iq[idx] * np.hanning(256)).astype(np.complex64)
    np.testing.assert_allclose(out, ref, atol=1e-5)
