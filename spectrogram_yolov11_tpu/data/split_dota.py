"""Sliding-window tiler for oversized images (reference: data/split_dota.py:97).

The reference's answer to inputs larger than the network size — overlapping
crops with label re-windowing at train time, merged NMS at eval. The same
machinery serves our long-spectrogram use case: a wide waterfall (long IQ
capture) is tiled along the time axis into square windows (SURVEY §5
long-context note)."""

from __future__ import annotations

import itertools
from pathlib import Path
from typing import List, Tuple

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


def get_windows(
    im_size: Tuple[int, int],
    crop_sizes: Tuple[int, ...] = (1024,),
    gaps: Tuple[int, ...] = (200,),
    im_rate_thr: float = 0.6,
) -> np.ndarray:
    """Window boxes (n, 4) xyxy covering (h, w) with overlap
    (reference: split_dota.py:97)."""
    h, w = im_size
    windows = []
    for crop, gap in zip(crop_sizes, gaps):
        step = crop - gap
        xn = 1 if w <= crop else int(np.ceil((w - crop) / step + 1))
        xs = [min(step * i, max(w - crop, 0)) for i in range(xn)]
        yn = 1 if h <= crop else int(np.ceil((h - crop) / step + 1))
        ys = [min(step * i, max(h - crop, 0)) for i in range(yn)]
        for x0, y0 in itertools.product(xs, ys):
            windows.append([x0, y0, min(x0 + crop, w), min(y0 + crop, h)])
    win = np.asarray(windows, np.int64)
    # keep windows that retain enough real image (edge windows)
    areas = (win[:, 2] - win[:, 0]) * (win[:, 3] - win[:, 1])
    rates = areas / float(crop_sizes[0] ** 2)
    if not (rates >= im_rate_thr).any():
        rates[rates.argmax()] = 1.0
    return win[rates >= im_rate_thr] if (rates >= im_rate_thr).any() else win


def window_labels(
    boxes_xyxy: np.ndarray, cls: np.ndarray, window: np.ndarray, area_thr: float = 0.6
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-window labels into a crop: keep boxes retaining >= area_thr of their
    area, shift to window coords (reference: split_dota crop_and_save)."""
    if len(boxes_xyxy) == 0:
        return boxes_xyxy, cls
    x0, y0, x1, y1 = window
    inter_x0 = np.maximum(boxes_xyxy[:, 0], x0)
    inter_y0 = np.maximum(boxes_xyxy[:, 1], y0)
    inter_x1 = np.minimum(boxes_xyxy[:, 2], x1)
    inter_y1 = np.minimum(boxes_xyxy[:, 3], y1)
    inter = np.clip(inter_x1 - inter_x0, 0, None) * np.clip(inter_y1 - inter_y0, 0, None)
    area = np.clip(boxes_xyxy[:, 2] - boxes_xyxy[:, 0], 1e-9, None) * np.clip(
        boxes_xyxy[:, 3] - boxes_xyxy[:, 1], 1e-9, None
    )
    keep = inter / area >= area_thr
    out = boxes_xyxy[keep].copy()
    out[:, [0, 2]] = np.clip(out[:, [0, 2]] - x0, 0, x1 - x0)
    out[:, [1, 3]] = np.clip(out[:, [1, 3]] - y0, 0, y1 - y0)
    return out, cls[keep]


def split_images_and_labels(
    data_root: str | Path,
    save_dir: str | Path,
    split: str = "train",
    crop_size: int = 1024,
    gap: int = 200,
) -> None:
    """Tile a YOLO-format dataset into overlapping crops (reference:
    split_dota.py split_trainval)."""
    from spectrogram_yolov11_tpu.data.dataset import IMG_FORMATS, img2label_path

    root = Path(data_root)
    out_img = Path(save_dir) / "images" / split
    out_lab = Path(save_dir) / "labels" / split
    out_img.mkdir(parents=True, exist_ok=True)
    out_lab.mkdir(parents=True, exist_ok=True)
    img_dir = root / "images" / split
    n_crops = 0
    for f in sorted(img_dir.glob("*")):
        if f.suffix[1:].lower() not in IMG_FORMATS:
            continue
        img = cv2.imread(str(f))
        h, w = img.shape[:2]
        # labels: normalized xywh -> pixel xyxy
        lf = Path(img2label_path(str(f)))
        boxes, cls = np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
        if lf.exists():
            rows = [r.split() for r in lf.read_text().splitlines() if r.strip()]
            if rows:
                arr = np.asarray([[float(v) for v in r[:5]] for r in rows], np.float32)
                cls = arr[:, 0].astype(np.int32)
                cxy, wh = arr[:, 1:3] * [w, h], arr[:, 3:5] * [w, h]
                boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1)
        for wi, win in enumerate(get_windows((h, w), (crop_size,), (gap,))):
            x0, y0, x1, y1 = (int(v) for v in win)
            crop = img[y0:y1, x0:x1]
            b, c = window_labels(boxes, cls, win)
            stem = f"{f.stem}__{x0}_{y0}"
            cv2.imwrite(str(out_img / f"{stem}.jpg"), crop)
            cw, ch = x1 - x0, y1 - y0
            lines = []
            for (bx0, by0, bx1, by1), k in zip(b, c):
                lines.append(
                    f"{k} {(bx0 + bx1) / 2 / cw:.6f} {(by0 + by1) / 2 / ch:.6f} "
                    f"{(bx1 - bx0) / cw:.6f} {(by1 - by0) / ch:.6f}"
                )
            (out_lab / f"{stem}.txt").write_text("\n".join(lines))
            n_crops += 1
    LOGGER.info(f"split: {n_crops} crops -> {save_dir}")


def tile_spectrogram(img: np.ndarray, window: int = 640, gap: int = 128) -> List[Tuple[np.ndarray, int]]:
    """Tile a wide waterfall (freq x time) along the TIME axis into square
    windows; returns [(crop, x_offset)] for merged-NMS inference."""
    h, w = img.shape[:2]
    wins = get_windows((h, w), (window,), (gap,))
    return [(img[:, int(x0) : int(x1)], int(x0)) for x0, _, x1, _ in wins]
