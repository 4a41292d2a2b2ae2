"""BaseSolution: shared plumbing for the turnkey region-analytics apps.

Counterpart of /root/reference/ultralytics/solutions/solutions.py:12 —
config merge, model load, per-frame track extraction. Geometry uses plain
numpy (the reference uses shapely; point-in-polygon and segment intersection
are small enough to implement directly)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


DEFAULT_SOL_CFG = {
    "region": None,
    "show_in": True,
    "show_out": True,
    "colormap": cv2.COLORMAP_JET,
    "up_angle": 145.0,
    "down_angle": 90.0,
    "kpts": [6, 8, 10],
    "analytics_type": "line",
    "json_file": None,
    "records": 5,
    "fps": 30.0,
    "max_hist": 5,
    "meter_per_pixel": 0.05,
    "max_speed": 120,
    "show": False,
    "line_width": 2,
}


def point_in_polygon(pt: Tuple[float, float], poly: List[Tuple[float, float]]) -> bool:
    """Ray-casting point-in-polygon."""
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1:
            inside = not inside
    return inside


def segments_intersect(p1, p2, p3, p4) -> bool:
    """Do segments p1-p2 and p3-p4 intersect?"""

    def ccw(a, b, c):
        return (c[1] - a[1]) * (b[0] - a[0]) > (b[1] - a[1]) * (c[0] - a[0])

    return ccw(p1, p3, p4) != ccw(p2, p3, p4) and ccw(p1, p2, p3) != ccw(p1, p2, p4)


class BaseSolution:
    """Model + tracker + per-frame track extraction (reference: solutions.py:12)."""

    def __init__(self, model: str = "yolo11n.ckpt", **kwargs):
        self.CFG = {**DEFAULT_SOL_CFG, **kwargs}
        from spectrogram_yolov11_tpu.engine.model import YOLO

        self.model = YOLO(model)
        self.names = self.model.names
        self.region = self.CFG["region"] or [(20, 400), (1080, 400)]
        self.track_history: Dict[int, List[Tuple[float, float]]] = defaultdict(list)
        self.env_check = True

    def extract_tracks(self, im0: np.ndarray):
        """Run track() on the frame; set boxes/clss/track_ids/confs."""
        results = self.model.track(im0, persist=True)
        r = results[0]
        if r.boxes is not None and len(r.boxes):
            self.boxes = r.boxes.xyxy
            self.clss = r.boxes.cls.astype(int).tolist()
            self.confs = r.boxes.conf.tolist()
            self.track_ids = getattr(r, "track_ids", np.arange(len(r.boxes))).tolist()
        else:
            self.boxes, self.clss, self.confs, self.track_ids = np.zeros((0, 4)), [], [], []
        return r

    def store_tracking_history(self, track_id: int, box) -> None:
        cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
        h = self.track_history[track_id]
        h.append((float(cx), float(cy)))
        if len(h) > 30:
            h.pop(0)

    def annotate(self, im0, box, label: str, color=(255, 144, 30)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(im0, p1, p2, color, self.CFG["line_width"])
        cv2.putText(im0, label, (p1[0], max(p1[1] - 5, 12)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)

    def draw_region(self, im0, color=(104, 0, 123)):
        pts = np.asarray(self.region, np.int32)
        if len(pts) == 2:
            cv2.line(im0, tuple(pts[0]), tuple(pts[1]), color, max(self.CFG["line_width"], 2))
        else:
            cv2.polylines(im0, [pts], True, color, max(self.CFG["line_width"], 2))
