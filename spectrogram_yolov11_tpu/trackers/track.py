"""Tracker hookup: attach track ids to predictor Results.

Counterpart of /root/reference/ultralytics/trackers/track.py (registered as
predictor callbacks there; here `YOLO.track()` routes results through this
module directly — same outcome, simpler control flow)."""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import List

import numpy as np

from spectrogram_yolov11_tpu.utils import yaml_load
from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def load_tracker_cfg(tracker: str) -> SimpleNamespace:
    p = Path(tracker)
    if not p.exists():
        p = Path(__file__).parents[1] / "cfg" / "trackers" / p.name
    return SimpleNamespace(**yaml_load(p))


def create_tracker(tracker: str = "botsort.yaml", frame_rate: int = 30):
    cfg = load_tracker_cfg(tracker)
    if cfg.tracker_type not in TRACKER_MAP:
        raise ValueError(f"unknown tracker_type '{cfg.tracker_type}' (want bytetrack|botsort)")
    return TRACKER_MAP[cfg.tracker_type](cfg, frame_rate=frame_rate)


def _apply_tracker(tr, r):
    """Update one tracker with one frame's Results (in place)."""
    if r.boxes is None or len(r.boxes) == 0:
        tr.update(np.zeros(0), np.zeros((0, 4)), np.zeros(0), r.orig_img)
        r.track_ids = np.zeros(0, int)
        return r
    det = r.boxes.data
    xywh = np.stack(
        [(det[:, 0] + det[:, 2]) / 2, (det[:, 1] + det[:, 3]) / 2, det[:, 2] - det[:, 0], det[:, 3] - det[:, 1]],
        axis=1,
    )
    tracks = tr.update(det[:, 4], xywh, det[:, 5], r.orig_img)
    if len(tracks) == 0:
        r.track_ids = np.zeros(0, int)
        return r
    from spectrogram_yolov11_tpu.engine.results import Boxes

    new = np.concatenate([tracks[:, :4], tracks[:, 5:6], tracks[:, 6:7]], axis=1)
    r.track_ids = tracks[:, 4].astype(int)
    r.boxes = Boxes(new, r.orig_shape, ids=r.track_ids)  # reference boxes.id surface
    return r


def track_stream(model, results_iter, persist: bool = False, tracker: str = "botsort.yaml"):
    """Streaming per-frame tracking over a Results generator (reference
    trackers/track.py:56 on_predict_postprocess_end: callback-style, not
    post-hoc — frames are tracked as they arrive, and the tracker resets when
    the source path changes, mirroring the per-video reset at track.py:70)."""
    if not persist or not hasattr(model, "_tracker"):
        model._tracker = create_tracker(tracker)
        model._track_path = None
    tr = model._tracker
    for r in results_iter:
        if model._track_path is not None and r.path != model._track_path and not persist:
            tr.reset()
        model._track_path = r.path
        yield _apply_tracker(tr, r)


def track_results(model, results: List, persist: bool = False, tracker: str = "botsort.yaml") -> List:
    """Run the tracker over a sequence of Results (video frames in order),
    rewriting each frame's boxes as [x1,y1,x2,y2,track_id,conf,cls] rows kept
    for matched detections (reference: trackers/track.py:56)."""
    if not persist or not hasattr(model, "_tracker"):
        model._tracker = create_tracker(tracker)
    tr = model._tracker
    for r in results:
        if r.boxes is None or len(r.boxes) == 0:
            tr.update(np.zeros(0), np.zeros((0, 4)), np.zeros(0), r.orig_img)
            r.track_ids = np.zeros(0, int)
            continue
        det = r.boxes.data
        xywh = np.stack(
            [(det[:, 0] + det[:, 2]) / 2, (det[:, 1] + det[:, 3]) / 2, det[:, 2] - det[:, 0], det[:, 3] - det[:, 1]],
            axis=1,
        )
        tracks = tr.update(det[:, 4], xywh, det[:, 5], r.orig_img)
        if len(tracks) == 0:
            r.track_ids = np.zeros(0, int)
            continue
        idx = tracks[:, -1].astype(int)
        from spectrogram_yolov11_tpu.engine.results import Boxes

        new = np.concatenate([tracks[:, :4], tracks[:, 5:6], tracks[:, 6:7]], axis=1)
        r.boxes = Boxes(new, r.orig_shape)
        r.track_ids = tracks[:, 4].astype(int)
    return results
