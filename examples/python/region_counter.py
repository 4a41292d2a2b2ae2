"""Count tracked objects inside movable polygonal regions of a video.

Counterpart of the reference's region counter
(/root/reference/examples/YOLOv8-Region-Counter/yolov8_region_counter.py):
per-frame `model.track`, point-in-polygon membership of each track's box
center, per-region live counts, draggable regions in the display window.
shapely is replaced by a numpy ray-casting test so the script has no extra
dependency.

Usage:
    python region_counter.py --model runs_artifacts/spectrogram_yolo11n.ckpt \
        --source video.mp4 --view --save out.mp4
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import numpy as np


def point_in_polygon(pt: np.ndarray, poly: np.ndarray) -> bool:
    """Ray-casting point-in-polygon: pt (2,), poly (n, 2)."""
    x, y = float(pt[0]), float(pt[1])
    xs, ys = poly[:, 0], poly[:, 1]
    xe, ye = np.roll(xs, -1), np.roll(ys, -1)
    # edges whose y-span straddles the ray, crossing x to the right of pt
    straddle = (ys > y) != (ye > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xcross = xs + (y - ys) * (xe - xs) / np.where(ye == ys, np.inf, ye - ys)
    return bool(np.count_nonzero(straddle & (xcross > x)) % 2)


def default_regions() -> list[dict]:
    """Two demo regions matching the reference example's layout."""
    return [
        {"name": "Polygon Region",
         "polygon": np.array([(50, 80), (250, 20), (450, 80), (400, 350), (100, 350)], np.float32),
         "counts": 0, "dragging": False, "region_color": (255, 42, 4), "text_color": (255, 255, 255)},
        {"name": "Rectangle Region",
         "polygon": np.array([(200, 250), (440, 250), (440, 550), (200, 550)], np.float32),
         "counts": 0, "dragging": False, "region_color": (37, 255, 225), "text_color": (0, 0, 0)},
    ]


def count_regions(model, frames, regions: list[dict], *, conf: float = 0.25,
                  cls_filter: int | None = None, history: int = 30):
    """Yield (annotated_frame, regions) per frame; each region's `counts` is
    the number of track centers currently inside it. `model` needs only a
    `.track(frame, conf=..., verbose=False) -> [Results]` method."""
    track_history: dict[int, list[tuple[float, float]]] = defaultdict(list)
    for frame in frames:
        for region in regions:
            region["counts"] = 0
        res = model.track(frame, conf=conf, verbose=False)[0]
        boxes = res.boxes
        if boxes is not None and len(boxes) and boxes.id is not None:
            xyxy = np.asarray(boxes.xyxy, np.float32)
            clss = np.asarray(boxes.cls, np.int64)
            ids = np.asarray(boxes.id, np.int64)
            for box, k, tid in zip(xyxy, clss, ids):
                if cls_filter is not None and int(k) != cls_filter:
                    continue
                center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2], np.float32)
                hist = track_history[int(tid)]
                hist.append((float(center[0]), float(center[1])))
                if len(hist) > history:
                    hist.pop(0)
                for region in regions:
                    if point_in_polygon(center, region["polygon"]):
                        region["counts"] += 1
        yield _annotate(frame, res, regions, track_history), regions


def _annotate(frame: np.ndarray, res, regions: list[dict], track_history: dict) -> np.ndarray:
    import cv2

    out = res.plot(img=frame.copy()) if hasattr(res, "plot") else frame.copy()
    for hist in track_history.values():
        if len(hist) > 1:
            cv2.polylines(out, [np.asarray(hist, np.int32)], False, (230, 230, 230), 1)
    for region in regions:
        poly = region["polygon"].astype(np.int32)
        cv2.polylines(out, [poly], True, region["region_color"], 3)
        cx, cy = poly.mean(0).astype(int)
        label = str(region["counts"])
        (tw, th), _ = cv2.getTextSize(label, 0, 0.9, 2)
        cv2.rectangle(out, (cx - tw // 2 - 6, cy - th - 6), (cx + tw // 2 + 6, cy + 6),
                      region["region_color"], -1)
        cv2.putText(out, label, (cx - tw // 2, cy), 0, 0.9, region["text_color"], 2)
    return out


def _mouse_callback(event, x, y, flags, regions):  # pragma: no cover - GUI only
    """LBUTTONDOWN grabs the region under the cursor, MOUSEMOVE drags it,
    LBUTTONUP releases — same interaction as the reference example."""
    import cv2

    pt = np.array([x, y], np.float32)
    if event == cv2.EVENT_LBUTTONDOWN:
        for region in regions:
            if point_in_polygon(pt, region["polygon"]):
                region["dragging"] = True
                region["offset"] = pt
    elif event == cv2.EVENT_MOUSEMOVE:
        for region in regions:
            if region.get("dragging"):
                region["polygon"] = region["polygon"] + (pt - region["offset"])
                region["offset"] = pt
    elif event == cv2.EVENT_LBUTTONUP:
        for region in regions:
            region["dragging"] = False


def main() -> None:  # pragma: no cover - CLI/video driver
    import cv2

    from spectrogram_yolov11_tpu import YOLO

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--classes", type=int, default=None)
    ap.add_argument("--view", action="store_true")
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    model = YOLO(args.model)
    cap = cv2.VideoCapture(args.source)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30
    writer = None
    regions = default_regions()
    if args.view:
        cv2.namedWindow("region-counter")
        cv2.setMouseCallback("region-counter", _mouse_callback, regions)

    def frames():
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            yield frame

    for annotated, regs in count_regions(model, frames(), regions,
                                         conf=args.conf, cls_filter=args.classes):
        if args.save:
            if writer is None:
                h, w = annotated.shape[:2]
                writer = cv2.VideoWriter(args.save, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            writer.write(annotated)
        if args.view:
            cv2.imshow("region-counter", annotated)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    cap.release()
    if writer is not None:
        writer.release()
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
