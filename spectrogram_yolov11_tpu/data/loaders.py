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
        self.fps_map: dict = {}  # video path -> source FPS, for save-time VideoWriter

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, str]]:
        for f in self.files:
            suffix = Path(f).suffix[1:].lower()
            if suffix in VID_FORMATS:
                cap = cv2.VideoCapture(f)
                self.fps_map[f] = max((cap.get(cv2.CAP_PROP_FPS) or 30) / self.vid_stride, 1)
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
    """Route source -> loader (reference: data/build.py:186 + check_source:160)."""
    if isinstance(source, (str, Path)):
        s = str(source)
        if s.endswith(".npy"):
            return LoadIQCaptures(source)
        if s.startswith("screen"):
            return LoadScreenshots(source)
        is_url = s.lower().startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://"))
        if s.isdigit() or s.endswith(".streams") or is_url:
            return LoadStreams(source, vid_stride=vid_stride)
        return LoadImagesAndVideos(source, vid_stride)
    if isinstance(source, int):
        return LoadStreams(str(source), vid_stride=vid_stride)
    if isinstance(source, np.ndarray) and source.ndim == 4:
        return LoadTensor(source) if source.shape[1] == 3 and source.shape[-1] != 3 else LoadPilAndNumpy(list(source))
    if isinstance(source, np.ndarray) or hasattr(source, "mode"):
        return LoadPilAndNumpy(source)
    if isinstance(source, (list, tuple)):
        return LoadPilAndNumpy(source)
    if hasattr(source, "shape") and hasattr(source, "__array__"):  # jax/torch tensor CHW
        return LoadTensor(source)
    raise TypeError(f"unsupported source type: {type(source)}")


class LoadStreams:
    """Threaded multi-stream reader with per-stream ring buffers
    (reference: data/loaders.py:51).

    Accepts camera indices ('0'), URLs (rtsp/http), video file paths, or a
    `.streams` text file listing one source per line. A daemon thread per
    stream keeps the newest `buffer_len` frames; iteration yields the latest
    frame per stream, so slow consumers drop frames instead of lagging
    (reference buffer=False semantics).
    """

    def __init__(self, sources="0", vid_stride: int = 1, buffer_len: int = 30, buffered: bool = False):
        import threading

        p = str(sources)
        if p.endswith(".streams") and Path(p).is_file():
            srcs = [s.strip() for s in Path(p).read_text().splitlines() if s.strip()]
        else:
            srcs = [sources]
        self.sources = [int(s) if str(s).isdigit() else s for s in srcs]
        self.vid_stride = vid_stride
        self.buffered = buffered
        self.running = True
        self.caps, self.frames, self.threads = [], [], []
        self.fps = []
        for i, s in enumerate(self.sources):
            cap = cv2.VideoCapture(s)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s}")
            self.caps.append(cap)
            self.fps.append(max(cap.get(cv2.CAP_PROP_FPS) or 30, 1))
            ok, frame = cap.read()
            if not ok:
                raise ConnectionError(f"failed to read from stream {s}")
            self.frames.append([frame])
            t = threading.Thread(target=self._reader, args=(i, cap, buffer_len), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int, cap, buffer_len: int) -> None:
        n = 0
        while self.running and cap.isOpened():
            if len(self.frames[i]) >= buffer_len:
                if not self.buffered:
                    self.frames[i].pop(0)  # drop oldest — keep latest frames
                else:
                    import time as _t

                    _t.sleep(0.01)
                    continue
            ok = cap.grab()
            if not ok:
                break
            n += 1
            if n % self.vid_stride == 0:
                ok, frame = cap.retrieve()
                if ok:
                    self.frames[i].append(frame)
        self.running = False

    def __iter__(self):
        import time as _t

        frame_i = 0
        while self.running or any(self.frames):
            for i, s in enumerate(self.sources):
                waited = 0.0
                while not self.frames[i]:
                    if not self.running or waited > 5.0:
                        self.close()
                        return
                    _t.sleep(0.005)
                    waited += 0.005
                frame = self.frames[i].pop(0) if self.buffered else self.frames[i].pop(-1)
                if not self.buffered:
                    self.frames[i].clear()
                yield str(s), frame, f"stream {i} frame {frame_i}"
            frame_i += 1

    def close(self) -> None:
        """Stop readers THEN release captures: releasing while a reader is
        inside cap.grab() is a use-after-free segfault in OpenCV (observed as
        a flaky crash in the test suite)."""
        self.running = False
        stuck = False
        for t in self.threads:
            if t.is_alive():
                t.join(timeout=5.0)
                stuck |= t.is_alive()
        if not stuck:  # a reader wedged in cap.grab() -> leak the cap, never free it under the reader
            for cap in self.caps:
                cap.release()
        self.caps, self.threads = [], []

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class LoadScreenshots:
    """Screen-capture source (reference: data/loaders.py:213). Requires `mss`
    (not bundled on TPU builds); availability-gated like the reference's
    optional deps."""

    def __init__(self, source="screen 0", **kwargs):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError("LoadScreenshots requires the 'mss' package (pip install mss)") from e
        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.kwargs = kwargs

    def __iter__(self):
        import mss

        with mss.mss() as sct:
            monitor = sct.monitors[self.screen + 1]
            i = 0
            while True:
                im = np.asarray(sct.grab(monitor))[:, :, :3]  # BGRA -> BGR
                yield f"screen{self.screen}", np.ascontiguousarray(im), f"screenshot {i}"
                i += 1


class LoadTensor:
    """Pre-tensorized input: (B, 3, H, W) or (3, H, W) arrays in [0, 1] or
    uint8, RGB CHW torch convention -> BGR HWC frames (reference: loaders.py:516)."""

    def __init__(self, tensor):
        arr = np.asarray(tensor)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4 or arr.shape[1] != 3:
            raise ValueError(f"LoadTensor expects (B, 3, H, W), got {arr.shape}")
        if arr.dtype != np.uint8:
            if float(arr.max(initial=0.0)) > 1.0 + 1e-3:
                raise ValueError("float tensor values must be normalized to [0, 1]")
            arr = (arr * 255).astype(np.uint8)
        self.imgs = arr

    def __iter__(self):
        for i, im in enumerate(self.imgs):
            yield f"tensor{i}", np.ascontiguousarray(im.transpose(1, 2, 0)[..., ::-1]), ""
