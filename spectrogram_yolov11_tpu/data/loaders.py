"""Inference source loaders (images / dirs / globs / video / numpy / PIL / IQ).

Counterpart of the reference streaming loaders
(/root/reference/ultralytics/data/loaders.py: LoadImagesAndVideos:284,
LoadPilAndNumpy:451, LoadTensor:516) plus an IQ-capture source for the
spectrogram front-end (.npy complex arrays -> on-device STFT).
"""

from __future__ import annotations

import glob
from pathlib import Path
from typing import Iterator, List, Tuple

import cv2
import numpy as np

from spectrogram_yolov11_tpu.data.dataset import IMG_FORMATS

VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}


class LoadImagesAndVideos:
    """Iterate (path, BGR image) over files, dirs, globs, and videos."""

    def __init__(self, source: str | Path, vid_stride: int = 1):
        p = str(source)
        files: List[str] = []
        if "*" in p:
            files = sorted(glob.glob(p, recursive=True))
        elif Path(p).is_dir():
            files = sorted(str(f) for f in Path(p).rglob("*") if f.suffix[1:].lower() in IMG_FORMATS | VID_FORMATS)
        elif Path(p).is_file():
            files = [p]
        else:
            raise FileNotFoundError(f"source not found: {source}")
        self.files = files
        self.vid_stride = vid_stride

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, str]]:
        for f in self.files:
            suffix = Path(f).suffix[1:].lower()
            if suffix in VID_FORMATS:
                cap = cv2.VideoCapture(f)
                frame_i = 0
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    if frame_i % self.vid_stride == 0:
                        yield f, frame, f"video frame {frame_i}"
                    frame_i += 1
                cap.release()
            else:
                img = cv2.imread(f)
                if img is None:
                    raise FileNotFoundError(f"unreadable image: {f}")
                yield f, img, ""


class LoadPilAndNumpy:
    """In-memory sources: numpy arrays (assumed BGR HWC, reference convention)
    or PIL images (RGB -> BGR)."""

    def __init__(self, source):
        self.items = source if isinstance(source, (list, tuple)) else [source]

    def __iter__(self):
        for i, item in enumerate(self.items):
            if hasattr(item, "mode"):  # PIL
                arr = np.asarray(item.convert("RGB"))[..., ::-1]
            else:
                arr = np.asarray(item)
            yield f"image{i}", np.ascontiguousarray(arr), ""


class LoadIQCaptures:
    """IQ .npy captures -> spectrogram images via the device STFT pipeline."""

    def __init__(self, source: str | Path, n_fft: int = 256, hop: int = 128, imgsz: int = 640):
        p = Path(source)
        self.files = sorted(str(f) for f in ([p] if p.is_file() else p.rglob("*.npy")))
        self.n_fft, self.hop, self.imgsz = n_fft, hop, imgsz

    def __iter__(self):
        from spectrogram_yolov11_tpu.ops.stft import iq_to_spectrogram

        for f in self.files:
            iq = np.load(f)
            img = np.asarray(
                iq_to_spectrogram(iq[None].astype(np.complex64), self.n_fft, self.hop, (self.imgsz, self.imgsz))
            )[0]
            bgr = (img[..., ::-1] * 255).astype(np.uint8)
            yield f, bgr, "iq capture"


def load_inference_source(source, vid_stride: int = 1):
    """Route source -> loader (reference: data/build.py:186)."""
    if isinstance(source, (str, Path)):
        if str(source).endswith(".npy"):
            return LoadIQCaptures(source)
        return LoadImagesAndVideos(source, vid_stride)
    if isinstance(source, np.ndarray) or hasattr(source, "mode"):
        return LoadPilAndNumpy(source)
    if isinstance(source, (list, tuple)):
        return LoadPilAndNumpy(source)
    raise TypeError(f"unsupported source type: {type(source)}")
