"""Track-then-classify action recognition over video.

Counterpart of the reference's action-recognition example
(/root/reference/examples/YOLOv8-Action-Recognition/action_recognition.py):
a detector tracks people, per-track crops accumulate into short clips, and a
classifier labels each clip. The reference pulls torchvision/HuggingFace
video models; this zero-egress build uses the framework's own classification
task model as the clip classifier (per-frame logits, temporal mean) — swap
`ClipClassifier` for any flax video model if you have weights.

TPU-first twist: the reference classifies each track's clip in its own
forward; here every (track x frame) crop in the window goes through ONE
fixed-shape jitted program per step — tracks are just rows of a batch. The
clip batch is padded to `max_tracks` so the program never recompiles.

Usage:
    python action_recognition.py --model runs_artifacts/spectrogram_yolo11n.ckpt \
        --classifier yolo11n-cls.yaml --source video.mp4 --crop-size 224 \
        --window 8 --save out.mp4
"""

from __future__ import annotations

import argparse
from collections import defaultdict, deque
from typing import Dict

import numpy as np


class ClipClassifier:
    """Clip-level labels from the framework's classify task model: per-frame
    class logits, softmax, temporal mean over the clip window."""

    def __init__(self, model: str = "yolo11n-cls.yaml", crop_size: int = 224, max_tracks: int = 8,
                 window: int = 8):
        import jax

        from spectrogram_yolov11_tpu.engine.model import YOLO

        self.m = YOLO(model)
        self.m._ensure_variables()
        self.names = self.m.model.names
        self.crop_size = crop_size
        self.max_tracks = max_tracks
        self.window = window

        def fwd(variables, clips_u8):
            import jax.numpy as jnp

            b, t = clips_u8.shape[:2]
            x = clips_u8.reshape((b * t,) + clips_u8.shape[2:]).astype(jnp.float32) / 255.0
            logits = self.m.model.apply(variables, x, train=False)
            probs = jax.nn.softmax(logits, axis=-1).reshape(b, t, -1)
            return probs.mean(axis=1)  # temporal mean over the clip

        self._fwd = jax.jit(fwd)

    def __call__(self, clips: np.ndarray) -> np.ndarray:
        """clips: (max_tracks, window, S, S, 3) uint8 RGB -> (max_tracks, nc) probs."""
        return np.asarray(self._fwd(self.m.variables, clips))


def square_crop(frame: np.ndarray, box: np.ndarray, size: int, margin: float = 0.1) -> np.ndarray:
    """Square crop around an xyxy box with margin, resized to (size, size)."""
    import cv2

    h, w = frame.shape[:2]
    x1, y1, x2, y2 = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    half = max(x2 - x1, y2 - y1) * (0.5 + margin)
    xa, xb = int(max(cx - half, 0)), int(min(cx + half, w))
    ya, yb = int(max(cy - half, 0)), int(min(cy + half, h))
    crop = frame[ya:yb, xa:xb]
    if crop.size == 0:
        crop = frame
    return cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)


def recognize(detector, classifier: ClipClassifier, frames, cls_filter: int | None = 0,
              conf: float = 0.25):
    """Run track -> clip-buffer -> classify over an iterable of BGR frames.

    Yields (frame, record) per frame: record = {"tracks": {tid: box},
    "actions": {tid: (label, prob)}}. Classification fires once per frame
    over all tracks with a full window (one device dispatch)."""
    buffers: Dict[int, deque] = defaultdict(lambda: deque(maxlen=classifier.window))
    for frame in frames:
        res = detector.track(frame, conf=conf, verbose=False)[0]
        boxes = res.boxes
        rec = {"tracks": {}, "actions": {}}
        tids = []
        if boxes is not None and boxes.id is not None:
            for box, tid, k in zip(boxes.xyxy, boxes.id.astype(int), boxes.cls.astype(int)):
                if cls_filter is not None and int(k) != cls_filter:
                    continue
                rec["tracks"][int(tid)] = np.asarray(box, np.float32)
                buffers[int(tid)].append(square_crop(frame[..., ::-1], box, classifier.crop_size))
                tids.append(int(tid))
        ready = [t for t in tids if len(buffers[t]) == classifier.window][: classifier.max_tracks]
        if ready:
            clips = np.zeros((classifier.max_tracks, classifier.window,
                              classifier.crop_size, classifier.crop_size, 3), np.uint8)
            for i, t in enumerate(ready):
                clips[i] = np.stack(buffers[t])
            probs = classifier(clips)
            for i, t in enumerate(ready):
                k = int(probs[i].argmax())
                rec["actions"][t] = (classifier.names.get(k, str(k)), float(probs[i, k]))
        yield frame, rec


def main() -> None:
    import cv2

    from spectrogram_yolov11_tpu.engine.model import YOLO

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="detector (.ckpt/.yaml)")
    ap.add_argument("--classifier", default="yolo11n-cls.yaml")
    ap.add_argument("--source", required=True)
    ap.add_argument("--crop-size", type=int, default=224)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--max-tracks", type=int, default=8)
    ap.add_argument("--cls", type=int, default=0, help="detector class to track (-1 = all)")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    det = YOLO(args.model)
    clf = ClipClassifier(args.classifier, args.crop_size, args.max_tracks, args.window)

    cap = cv2.VideoCapture(args.source)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30

    def frames():
        while True:
            ok, f = cap.read()
            if not ok:
                return
            yield f

    writer = None
    for frame, rec in recognize(det, clf, frames(), None if args.cls < 0 else args.cls, args.conf):
        for tid, box in rec["tracks"].items():
            x1, y1, x2, y2 = box.astype(int)
            label = rec["actions"].get(tid)
            txt = f"id{tid}" + (f" {label[0]} {label[1]:.2f}" if label else "")
            cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(frame, txt, (x1, y1 - 4), 0, 0.6, (0, 255, 0), 2)
        if args.save:
            if writer is None:
                writer = cv2.VideoWriter(args.save, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                         (frame.shape[1], frame.shape[0]))
            writer.write(frame)
    if writer is not None:
        writer.release()
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
