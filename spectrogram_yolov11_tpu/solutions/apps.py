"""The 14 turnkey solutions (reference: /root/reference/ultralytics/solutions/).

Each app consumes frames (BGR numpy) and returns the annotated frame plus its
running analytics state — same surface as the reference's `app(im0)` pattern.
"""

from __future__ import annotations

import math
import time
from collections import defaultdict, deque
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER
from .solutions import BaseSolution, point_in_polygon, segments_intersect


class ObjectCounter(BaseSolution):
    """In/out counting across a line or region (reference: object_counter.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.in_count = 0
        self.out_count = 0
        self.counted_ids: set = set()
        self.classwise: Dict[str, Dict[str, int]] = defaultdict(lambda: {"IN": 0, "OUT": 0})

    def __call__(self, im0):
        self.extract_tracks(im0)
        self.draw_region(im0)
        for box, tid, cls in zip(self.boxes, self.track_ids, self.clss):
            self.store_tracking_history(tid, box)
            hist = self.track_history[tid]
            self.annotate(im0, box, f"{self.names.get(cls, cls)} #{tid}")
            if tid in self.counted_ids or len(hist) < 2:
                continue
            prev, cur = hist[-2], hist[-1]
            if len(self.region) == 2:
                if segments_intersect(prev, cur, self.region[0], self.region[1]):
                    going_in = cur[1] < prev[1]  # upward = IN by convention
                    self._count(tid, cls, going_in)
            else:
                was_in = point_in_polygon(prev, self.region)
                is_in = point_in_polygon(cur, self.region)
                if was_in != is_in:
                    self._count(tid, cls, is_in)
        cv2.putText(im0, f"IN {self.in_count}  OUT {self.out_count}", (12, 28),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2)
        return im0

    def _count(self, tid, cls, going_in: bool):
        self.counted_ids.add(tid)
        name = self.names.get(cls, str(cls))
        if going_in:
            self.in_count += 1
            self.classwise[name]["IN"] += 1
        else:
            self.out_count += 1
            self.classwise[name]["OUT"] += 1


class RegionCounter(BaseSolution):
    """Live object count inside regions (reference: region_counter.py)."""

    def __call__(self, im0):
        self.extract_tracks(im0)
        self.draw_region(im0)
        count = 0
        for box in self.boxes:
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if point_in_polygon(c, self.region):
                count += 1
        self.region_count = count
        cv2.putText(im0, f"count {count}", (12, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2)
        return im0


class Heatmap(BaseSolution):
    """Accumulated presence heatmap (reference: heatmap.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.heat: Optional[np.ndarray] = None

    def __call__(self, im0):
        if self.heat is None:
            self.heat = np.zeros(im0.shape[:2], np.float32)
        self.extract_tracks(im0)
        for box in self.boxes:
            x1, y1, x2, y2 = (int(v) for v in box)
            self.heat[max(y1, 0) : y2, max(x1, 0) : x2] += 1
        norm = cv2.normalize(self.heat, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
        colored = cv2.applyColorMap(norm, self.CFG["colormap"])
        return cv2.addWeighted(im0, 0.5, colored, 0.5, 0)


class SpeedEstimator(BaseSolution):
    """Track-velocity speed estimation (reference: speed_estimation.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.speeds: Dict[int, float] = {}

    def __call__(self, im0):
        self.extract_tracks(im0)
        mpp, fps = self.CFG["meter_per_pixel"], self.CFG["fps"]
        for box, tid in zip(self.boxes, self.track_ids):
            self.store_tracking_history(tid, box)
            h = self.track_history[tid]
            if len(h) >= 2:
                d_px = math.dist(h[-1], h[-2])
                kmh = min(d_px * mpp * fps * 3.6, self.CFG["max_speed"])
                self.speeds[tid] = 0.7 * self.speeds.get(tid, kmh) + 0.3 * kmh
                self.annotate(im0, box, f"{self.speeds[tid]:.0f} km/h")
        return im0


class QueueManager(BaseSolution):
    """Queue-length monitoring in a region (reference: queue_management.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.queue_count = 0

    def __call__(self, im0):
        self.extract_tracks(im0)
        self.draw_region(im0)
        self.queue_count = sum(
            point_in_polygon(((b[0] + b[2]) / 2, (b[1] + b[3]) / 2), self.region) for b in self.boxes
        )
        cv2.putText(im0, f"queue {self.queue_count}", (12, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 200, 255), 2)
        return im0


class TrackZone(BaseSolution):
    """Track only inside a zone (reference: trackzone.py)."""

    def __call__(self, im0):
        self.extract_tracks(im0)
        self.draw_region(im0)
        for box, tid, cls in zip(self.boxes, self.track_ids, self.clss):
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if point_in_polygon(c, self.region):
                self.annotate(im0, box, f"{self.names.get(cls, cls)} #{tid}")
        return im0


class DistanceCalculation(BaseSolution):
    """Pairwise distance between two selected tracks (reference: distance_calculation.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.selected: List[int] = kwargs.get("selected_ids", [])

    def __call__(self, im0):
        self.extract_tracks(im0)
        centers = {}
        for box, tid in zip(self.boxes, self.track_ids):
            centers[tid] = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            self.annotate(im0, box, f"#{tid}")
        ids = self.selected or list(centers)[:2]
        if len(ids) >= 2 and all(i in centers for i in ids[:2]):
            a, b = centers[ids[0]], centers[ids[1]]
            d_m = math.dist(a, b) * self.CFG["meter_per_pixel"]
            cv2.line(im0, (int(a[0]), int(a[1])), (int(b[0]), int(b[1])), (255, 0, 255), 2)
            cv2.putText(im0, f"{d_m:.2f} m", (int((a[0] + b[0]) / 2), int((a[1] + b[1]) / 2)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 0, 255), 2)
            self.distance_m = d_m
        return im0


class SecurityAlarm(BaseSolution):
    """Alert when detections exceed a threshold (reference: security_alarm.py;
    email hookup replaced by a callback — zero-egress environment)."""

    def __init__(self, records: int = 5, on_alarm=None, **kwargs):
        super().__init__(records=records, **kwargs)
        self.on_alarm = on_alarm or (lambda n: LOGGER.warning(f"SecurityAlarm: {n} objects detected!"))
        self.alerted = False

    def __call__(self, im0):
        self.extract_tracks(im0)
        n = len(self.boxes)
        for box, cls in zip(self.boxes, self.clss):
            self.annotate(im0, box, self.names.get(cls, str(cls)), color=(0, 0, 255))
        if n >= self.CFG["records"] and not self.alerted:
            self.on_alarm(n)
            self.alerted = True
        return im0


class AIGym(BaseSolution):
    """Workout rep counting from pose keypoints (reference: ai_gym.py)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("model", "yolo11n-pose.ckpt")
        super().__init__(**kwargs)
        self.count: Dict[int, int] = defaultdict(int)
        self.stage: Dict[int, str] = defaultdict(lambda: "-")

    @staticmethod
    def _angle(a, b, c) -> float:
        ang = abs(math.degrees(math.atan2(c[1] - b[1], c[0] - b[0]) - math.atan2(a[1] - b[1], a[0] - b[0])))
        return 360 - ang if ang > 180 else ang

    def __call__(self, im0):
        results = self.model.predict(im0)
        r = results[0]
        if r.keypoints is None:
            return im0
        k1, k2, k3 = self.CFG["kpts"]
        for i, kpts in enumerate(r.keypoints.data):
            if max(k1, k2, k3) >= len(kpts):
                continue
            ang = self._angle(kpts[k1][:2], kpts[k2][:2], kpts[k3][:2])
            if ang > self.CFG["up_angle"]:
                if self.stage[i] == "down":
                    self.count[i] += 1
                self.stage[i] = "up"
            elif ang < self.CFG["down_angle"]:
                self.stage[i] = "down"
            cv2.putText(im0, f"reps {self.count[i]} ({self.stage[i]})", (12, 28 + 24 * i),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2)
        return im0


class Analytics(BaseSolution):
    """Per-frame class-count analytics rendered as line/bar/pie charts
    (reference: analytics.py — matplotlib)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.history: deque = deque(maxlen=120)

    def __call__(self, im0, frame_number: int = 0):
        self.extract_tracks(im0)
        counts = defaultdict(int)
        for c in self.clss:
            counts[self.names.get(c, str(c))] += 1
        self.history.append((frame_number, dict(counts)))
        return self.plot(im0.shape)

    def plot(self, shape):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4.5))
        kind = self.CFG["analytics_type"]
        keys = sorted({k for _, c in self.history for k in c})
        if kind in {"line", "area"}:
            xs = [f for f, _ in self.history]
            for k in keys:
                ys = [c.get(k, 0) for _, c in self.history]
                ax.plot(xs, ys, label=k)
            ax.legend()
        elif kind == "bar":
            last = self.history[-1][1] if self.history else {}
            ax.bar(list(last), list(last.values()))
        else:  # pie
            last = self.history[-1][1] if self.history else {}
            if last:
                ax.pie(list(last.values()), labels=list(last))
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3][..., ::-1]
        plt.close(fig)
        return np.ascontiguousarray(img)


class ParkingManagement(BaseSolution):
    """Occupancy of annotated parking slots (reference: parking_management.py)."""

    def __init__(self, json_file=None, **kwargs):
        super().__init__(json_file=json_file, **kwargs)
        import json as _json

        self.slots = []
        if json_file:
            self.slots = _json.loads(open(json_file).read())  # [{"points": [[x,y],...]}]

    def __call__(self, im0):
        self.extract_tracks(im0)
        occupied = 0
        centers = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in self.boxes]
        for slot in self.slots:
            pts = slot["points"]
            occ = any(point_in_polygon(c, pts) for c in centers)
            occupied += occ
            cv2.polylines(im0, [np.asarray(pts, np.int32)], True, (0, 0, 255) if occ else (0, 255, 0), 2)
        self.occupied = occupied
        self.available = len(self.slots) - occupied
        cv2.putText(im0, f"occupied {occupied}/{len(self.slots)}", (12, 28),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 0), 2)
        return im0


class ObjectCropper(BaseSolution):
    """Save per-detection crops (reference: object_cropper.py)."""

    def __init__(self, crop_dir: str = "runs/crops", **kwargs):
        super().__init__(**kwargs)
        from pathlib import Path

        self.crop_dir = Path(crop_dir)
        self.crop_dir.mkdir(parents=True, exist_ok=True)
        self.idx = 0

    def __call__(self, im0):
        self.extract_tracks(im0)
        for box, cls in zip(self.boxes, self.clss):
            x1, y1, x2, y2 = (max(int(v), 0) for v in box)
            crop = im0[y1:y2, x1:x2]
            if crop.size:
                cv2.imwrite(str(self.crop_dir / f"{self.names.get(cls, cls)}_{self.idx}.jpg"), crop)
                self.idx += 1
        return im0


class ObjectBlurrer(BaseSolution):
    """Blur detected objects (reference: object_blurrer.py)."""

    def __call__(self, im0):
        self.extract_tracks(im0)
        for box in self.boxes:
            x1, y1, x2, y2 = (max(int(v), 0) for v in box)
            roi = im0[y1:y2, x1:x2]
            if roi.size:
                im0[y1:y2, x1:x2] = cv2.blur(roi, (25, 25))
        return im0


class VisionEye(BaseSolution):
    """Vision-eye point mapping to detections (reference: vision_eye.py)."""

    def __init__(self, vision_point: Tuple[int, int] = (30, 30), **kwargs):
        super().__init__(**kwargs)
        self.vision_point = vision_point

    def __call__(self, im0):
        self.extract_tracks(im0)
        for box, tid in zip(self.boxes, self.track_ids):
            c = (int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2))
            cv2.circle(im0, c, 4, (0, 255, 0), -1)
            cv2.line(im0, self.vision_point, c, (0, 255, 255), 1)
            self.annotate(im0, box, f"#{tid}")
        return im0


class SpectrumMonitor(BaseSolution):
    """Spectrum-sensing solution (ours, the north-star domain): stream IQ
    captures -> on-device STFT -> LTE/RF detection -> per-band occupancy."""

    def __init__(self, n_fft: int = 256, hop: int = 128, **kwargs):
        kwargs.setdefault("model", "spectrogram_yolo11.yaml")
        super().__init__(**kwargs)
        self.n_fft, self.hop = n_fft, hop
        self.occupancy: Dict[str, float] = {}

    def __call__(self, iq: np.ndarray):
        """iq: complex64 capture -> (annotated BGR spectrogram, band reports)."""
        from spectrogram_yolov11_tpu.ops.stft import iq_to_spectrogram

        img = np.asarray(iq_to_spectrogram(iq[None].astype(np.complex64), self.n_fft, self.hop, (640, 640)))[0]
        bgr = (img[..., ::-1] * 255).astype(np.uint8)
        results = self.model.predict(bgr)
        r = results[0]
        reports = []
        if r.boxes is not None:
            for b in r.boxes.data:
                f0, f1 = b[1] / 640, b[3] / 640  # rows = frequency
                t0, t1 = b[0] / 640, b[2] / 640
                reports.append({
                    "class": self.names.get(int(b[5]), str(int(b[5]))),
                    "conf": float(b[4]),
                    "freq_band": (float(f0), float(f1)),
                    "time_span": (float(t0), float(t1)),
                })
        self.reports = reports
        return r.plot(), reports
