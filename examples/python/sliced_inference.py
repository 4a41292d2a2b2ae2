"""SAHI-style sliced inference: tile oversized images into overlapping
windows, batch them through ONE device program, merge detections with a
global class-aware NMS.

Counterpart of the reference's SAHI example
(/root/reference/examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py), built
on this framework's own tiler (data/split_dota.get_windows — the same
windowing the DOTA trainer uses) instead of the sahi pip package. TPU-first
twist: every window of a frame goes through the predictor as ONE fixed-shape
batch (one dispatch per frame), not crop-by-crop like the reference example.

Usage:
    python sliced_inference.py --model runs_artifacts/spectrogram_yolo11n.ckpt \
        --source wide_spectrogram.png --window 640 --gap 128 --save out.png
"""

from __future__ import annotations

import argparse
from typing import List, Tuple

import numpy as np


def merge_window_detections(
    dets_per_window: List[np.ndarray],
    windows: np.ndarray,
    iou_thres: float = 0.5,
    conf_thres: float = 0.25,
) -> np.ndarray:
    """Offset per-window detections back to full-image coords and run a
    global class-aware greedy NMS over the union.

    dets_per_window: list of (n_i, 6) [x1, y1, x2, y2, conf, cls] in window
    coords; windows: (W, 4) xyxy window origins in the full image.
    Returns (m, 6) merged detections, confidence-sorted.
    """
    merged = []
    for det, win in zip(dets_per_window, windows):
        if det is None or len(det) == 0:
            continue
        d = np.asarray(det, np.float32).copy()
        d[:, [0, 2]] += win[0]
        d[:, [1, 3]] += win[1]
        merged.append(d)
    if not merged:
        return np.zeros((0, 6), np.float32)
    d = np.concatenate(merged, 0)
    d = d[d[:, 4] >= conf_thres]
    d = d[np.argsort(-d[:, 4])]
    # class-aware greedy NMS (native C++ kernel when built, numpy otherwise)
    off = d[:, 5:6] * 7680.0  # class offset trick (reference ops.py:305)
    boxes, scores = d[:, :4] + off, d[:, 4]
    keep = _greedy_nms(boxes, scores, iou_thres)
    return d[keep]


def _greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    try:
        from spectrogram_yolov11_tpu.utils.native import load_native, native_greedy_nms

        if load_native() is not None:
            return native_greedy_nms(boxes, scores, iou_thres, 0.0)
    except Exception:
        pass
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = boxes[order[1:]]
        x1 = np.maximum(boxes[i, 0], rest[:, 0])
        y1 = np.maximum(boxes[i, 1], rest[:, 1])
        x2 = np.minimum(boxes[i, 2], rest[:, 2])
        y2 = np.minimum(boxes[i, 3], rest[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
        iou = inter / (a + b - inter + 1e-9)
        order = order[1:][iou <= iou_thres]
    return np.asarray(keep, np.int64)


def predict_sliced(
    model,
    image_bgr: np.ndarray,
    window: int = 640,
    gap: int = 128,
    conf: float = 0.25,
    iou: float = 0.5,
    imgsz: int = 640,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tile -> one batched predict -> merge. Returns (dets (m, 6), windows)."""
    from spectrogram_yolov11_tpu.data.split_dota import get_windows

    h, w = image_bgr.shape[:2]
    windows = get_windows((h, w), crop_sizes=(window,), gaps=(gap,), im_rate_thr=0.6)
    crops = []
    for x1, y1, x2, y2 in windows:
        crop = image_bgr[y1:y2, x1:x2]
        if crop.shape[0] != window or crop.shape[1] != window:  # edge tiles
            pad = np.full((window, window, 3), 114, np.uint8)
            pad[: crop.shape[0], : crop.shape[1]] = crop
            crop = pad
        crops.append(crop)
    results = model.predict(crops, imgsz=imgsz, conf=conf, iou=iou, verbose=False)
    dets = [r.boxes.data if r.boxes is not None else None for r in results]
    return merge_window_detections(dets, windows, iou_thres=iou, conf_thres=conf), windows


def main() -> None:
    import cv2

    from spectrogram_yolov11_tpu.engine.model import YOLO

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="runs_artifacts/spectrogram_yolo11n.ckpt")
    ap.add_argument("--source", required=True, help="image path (any size)")
    ap.add_argument("--window", type=int, default=640)
    ap.add_argument("--gap", type=int, default=128)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--save", default="", help="annotated output path")
    args = ap.parse_args()

    model = YOLO(args.model)
    img = cv2.imread(args.source)
    if img is None:
        raise FileNotFoundError(args.source)
    dets, windows = predict_sliced(
        model, img, window=args.window, gap=args.gap, conf=args.conf, iou=args.iou
    )
    names = model.names or {}
    print(f"{len(windows)} windows -> {len(dets)} merged detections")
    for x1, y1, x2, y2, c, k in dets:
        print(f"  {names.get(int(k), int(k))}: conf={c:.3f} box=({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")
    if args.save:
        for x1, y1, x2, y2, c, k in dets:
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 2)
            cv2.putText(img, f"{names.get(int(k), int(k))} {c:.2f}", (int(x1), int(y1) - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        cv2.imwrite(args.save, img)
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
