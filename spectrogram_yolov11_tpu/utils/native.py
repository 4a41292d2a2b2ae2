"""ctypes bindings for the native preprocessing core (native/preprocess.cpp).

Auto-builds with g++ on first use if the .so is missing; every entry point
has a numpy/cv2 fallback so the framework works without a toolchain."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER, REPO_ROOT

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libsytnative.so; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = REPO_ROOT / "native" / "libsytnative.so"
    if not so.exists():
        build = REPO_ROOT / "native" / "build.sh"
        if build.exists():
            try:
                subprocess.run(["sh", str(build)], check=True, capture_output=True, timeout=120)
            except (subprocess.SubprocessError, OSError) as e:
                LOGGER.info(f"native lib build unavailable ({e}); using numpy/cv2 fallbacks")
                return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.letterbox_into_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fill_u8.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_uint8]
    lib.greedy_nms.restype = ctypes.c_int
    lib.greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.frame_iq_hann.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeBatchLetterbox:
    """Batch letterboxer writing straight into a persistent buffer.

    Mirrors engine/predictor.preprocess semantics (resize + 114 pad; the
    BGR->RGB flip and /255 happen on device)."""

    def __init__(self, batch: int, imgsz: int, pad_value: int = 114):
        self.lib = load_native()
        self.imgsz = imgsz
        self.buf = np.full((batch, imgsz, imgsz, 3), pad_value, np.uint8)
        self.geom = np.zeros((batch, 3), np.float32)
        self.pad_value = pad_value

    def __call__(self, frames) -> Tuple[np.ndarray, np.ndarray]:
        if self.lib is None:
            from spectrogram_yolov11_tpu.data.augment import letterbox

            for i, f in enumerate(frames):
                img, (r, _), (dw, dh) = letterbox(f, (self.imgsz, self.imgsz), pad_value=self.pad_value)
                self.buf[i] = img
                self.geom[i] = (r, dw, dh)
            return self.buf, self.geom
        self.lib.fill_u8(_u8p(self.buf), self.buf.size, self.pad_value)
        for i, f in enumerate(frames):
            f = np.ascontiguousarray(f, dtype=np.uint8)
            self.lib.letterbox_into_batch(
                _u8p(f), f.shape[0], f.shape[1], _u8p(self.buf), i, self.imgsz,
                self.geom[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        return self.buf, self.geom


def native_greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float, conf_thres: float) -> np.ndarray:
    """Host-side greedy NMS keep-mask (expects score-desc order)."""
    lib = load_native()
    n = len(boxes)
    keep = np.zeros(n, np.uint8)
    if lib is None or n == 0:
        from spectrogram_yolov11_tpu.ops.metrics import box_iou_np

        dead = np.zeros(n, bool)
        for i in range(n):
            if dead[i] or scores[i] <= conf_thres:
                continue
            keep[i] = 1
            iou = box_iou_np(boxes[i : i + 1], boxes[i + 1 :])[0]
            dead[i + 1 :] |= iou > iou_thres
        return keep.astype(bool)
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    lib.greedy_nms(_f32p(b), _f32p(s), n, iou_thres, conf_thres, _u8p(keep))
    return keep.astype(bool)


def native_frame_iq(iq: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Hann-windowed framing of complex64 IQ -> (frames, n_fft) complex64."""
    iq = np.ascontiguousarray(iq, np.complex64)
    frames = 1 + (len(iq) - n_fft) // hop
    lib = load_native()
    if lib is None:
        idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
        return (iq[idx] * np.hanning(n_fft)).astype(np.complex64)
    out = np.empty((frames, n_fft), np.complex64)
    lib.frame_iq_hann(_f32p(iq.view(np.float32)), len(iq), _f32p(out.view(np.float32)), n_fft, hop)
    return out
