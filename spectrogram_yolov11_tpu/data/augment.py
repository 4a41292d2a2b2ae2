"""Host-side augmentation pipeline (numpy + cv2).

Functional re-implementation of the reference augmentation stack
(/root/reference/ultralytics/data/augment.py: LetterBox:1477, Mosaic:490,
RandomPerspective:952, RandomHSV:1303, RandomFlip:1383, Format:1926) —
geometry and rounding conventions reproduced exactly (SURVEY A6, A8-A10)
because they shift mAP by tenths. The pipeline feeds FIXED-SHAPE padded
batches to the device: dynamic per-image work (mosaic canvases, warps) stays
on host CPU where raggedness is free; the TPU only ever sees
(b, imgsz, imgsz, 3) images and (b, max_gt, ...) padded labels.

Labels travel as a dict: {"img": HWC uint8 BGR, "cls": (n,), "bboxes": (n,4)
xyxy pixels} — converted to normalized xywh only at batch-format time.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    auto: bool = False,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
    center: bool = True,
    pad_value: int = 114,
) -> Tuple[np.ndarray, Tuple[float, float], Tuple[float, float]]:
    """Aspect-preserving resize + pad (reference: augment.py:1477-1593).

    Returns (image, ratio, (dw, dh)) with the exact round(x - 0.1)/(x + 0.1)
    padding split the reference uses.
    """
    shape = img.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # w, h
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top = int(round(dh - 0.1)) if center else 0
    bottom = int(round(dh + 0.1))
    left = int(round(dw - 0.1)) if center else 0
    right = int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(pad_value,) * 3)
    return img, ratio, (dw, dh)


def augment_hsv(img: np.ndarray, hgain: float = 0.5, sgain: float = 0.5, vgain: float = 0.5, rng=None) -> np.ndarray:
    """In-place HSV jitter via uint8 LUTs (reference: augment.py:1346-1380)."""
    rng = rng or np.random.default_rng()
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(img.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def mosaic4(
    samples: List[Dict],
    imgsz: int,
    rng,
) -> Dict:
    """4-image mosaic onto a 2s x 2s canvas (reference: augment.py:490-700).

    Center (xc, yc) ~ U(s/2, 3s/2) via border = -s/2; tiles clipped to canvas;
    labels offset by the tile's (padw, padh).
    """
    s = imgsz
    border = (-s // 2, -s // 2)
    yc, xc = (int(rng.uniform(-b, 2 * s + b)) for b in border)
    canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    cls_out, box_out = [], []
    for i, sample in enumerate(samples):
        img = sample["img"]
        h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(sample["cls"]):
            b = sample["bboxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            box_out.append(b)
            cls_out.append(sample["cls"])
    cls_cat = np.concatenate(cls_out) if cls_out else np.zeros((0,), np.int32)
    box_cat = np.concatenate(box_out) if box_out else np.zeros((0, 4), np.float32)
    # clip to canvas (reference clips inside Instances)
    box_cat = np.clip(box_cat, 0, 2 * s)
    return {"img": canvas, "cls": cls_cat, "bboxes": box_cat, "mosaic_border": border}


def box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16) -> np.ndarray:
    """Post-warp box viability filter (reference: augment.py:1254-1300)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(
    sample: Dict,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
    rng=None,
) -> Dict:
    """Single combined warp M = T @ S @ R @ P @ C with box transform and
    candidate filtering (reference: augment.py:952-1258)."""
    rng = rng or np.random.default_rng()
    img = sample["img"]
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    boxes = sample["bboxes"]
    cls = sample["cls"]
    if len(boxes):
        n = len(boxes)
        xy = np.ones((n * 4, 3))
        xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        keep = box_candidates(boxes.T * s, new.T, area_thr=0.10)
        boxes, cls = new[keep].astype(np.float32), cls[keep]
    return {"img": img, "cls": cls, "bboxes": boxes}


def random_flip(sample: Dict, fliplr: float = 0.5, flipud: float = 0.0, rng=None) -> Dict:
    """Horizontal/vertical flips with box updates (reference: augment.py:1383)."""
    rng = rng or np.random.default_rng()
    img, boxes = sample["img"], sample["bboxes"]
    h, w = img.shape[:2]
    if flipud and rng.random() < flipud:
        img = np.flipud(img)
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    if fliplr and rng.random() < fliplr:
        img = np.fliplr(img)
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    return {"img": np.ascontiguousarray(img), "cls": sample["cls"], "bboxes": boxes}


def mixup(sample1: Dict, sample2: Dict, rng=None) -> Dict:
    """Image mixup with beta(32, 32) ratio (reference: augment.py:867)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    img = (sample1["img"].astype(np.float32) * r + sample2["img"].astype(np.float32) * (1 - r)).astype(np.uint8)
    return {
        "img": img,
        "cls": np.concatenate([sample1["cls"], sample2["cls"]]),
        "bboxes": np.concatenate([sample1["bboxes"], sample2["bboxes"]]),
    }


def format_sample(sample: Dict, imgsz: int, max_gt: int, bgr2rgb: bool = True) -> Dict[str, np.ndarray]:
    """Final Format step (reference: augment.py:1926): HWC BGR uint8 ->
    HWC RGB float-ready image + normalized xywh labels padded to max_gt.
    (We keep HWC — NHWC is the TPU-native layout; the reference converts to CHW.)
    """
    img = sample["img"]
    h, w = img.shape[:2]
    if bgr2rgb:
        img = img[..., ::-1]
    boxes = sample["bboxes"]
    cls = sample["cls"]
    n = min(len(boxes), max_gt)
    box_pad = np.zeros((max_gt, 4), np.float32)
    cls_pad = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    if n:
        b = boxes[:n].astype(np.float32)
        xywh = np.stack(
            [(b[:, 0] + b[:, 2]) / 2 / w, (b[:, 1] + b[:, 3]) / 2 / h, (b[:, 2] - b[:, 0]) / w, (b[:, 3] - b[:, 1]) / h],
            axis=1,
        )
        # drop degenerate boxes (zero w/h after clipping)
        good = (xywh[:, 2] > 0) & (xywh[:, 3] > 0)
        k = int(good.sum())
        box_pad[:k] = xywh[good]
        cls_pad[:k] = sample["cls"][:n][good]
        mask[:k] = True
    return {"img": np.ascontiguousarray(img), "cls": cls_pad, "bboxes": box_pad, "mask_gt": mask}


class TrainTransform:
    """v8_transforms-equivalent pipeline (reference: augment.py:2278):
    Mosaic -> RandomPerspective -> (MixUp) -> HSV -> flips, then Format."""

    def __init__(self, dataset, imgsz: int, hyp, max_gt: int = 128):
        self.dataset = dataset
        self.imgsz = imgsz
        self.hyp = hyp
        self.max_gt = max_gt
        self.mosaic_enabled = True

    def close_mosaic(self):
        self.mosaic_enabled = False

    def __call__(self, idx: int, rng) -> Dict[str, np.ndarray]:
        h = self.hyp
        use_mosaic = self.mosaic_enabled and rng.random() < h.mosaic
        if use_mosaic:
            idxs = [idx] + list(rng.integers(0, len(self.dataset), 3))
            samples = [self.dataset.load_sample(i, square_to=self.imgsz) for i in idxs]
            sample = mosaic4(samples, self.imgsz, rng)
            border = sample.pop("mosaic_border")
        else:
            sample = self.dataset.load_sample(idx, square_to=self.imgsz)
            img, _, (dw, dh) = letterbox(sample["img"], (self.imgsz, self.imgsz), scaleup=True)
            boxes = sample["bboxes"].copy()
            if len(boxes):
                r = min(self.imgsz / sample["img"].shape[0], self.imgsz / sample["img"].shape[1])
                # load_sample already long-side-resized; letterbox only pads here
                boxes[:, [0, 2]] += int(round(dw - 0.1))
                boxes[:, [1, 3]] += int(round(dh - 0.1))
            sample = {"img": img, "cls": sample["cls"], "bboxes": boxes}
            border = (0, 0)
        sample = random_perspective(
            sample,
            degrees=h.degrees,
            translate=h.translate,
            scale=h.scale,
            shear=h.shear,
            perspective=h.perspective,
            border=border,
            rng=rng,
        )
        if use_mosaic and h.mixup and rng.random() < h.mixup:
            idx2 = int(rng.integers(0, len(self.dataset)))
            s2 = [self.dataset.load_sample(i, square_to=self.imgsz) for i in [idx2] + list(rng.integers(0, len(self.dataset), 3))]
            m2 = mosaic4(s2, self.imgsz, rng)
            b2 = m2.pop("mosaic_border")
            m2 = random_perspective(m2, h.degrees, h.translate, h.scale, h.shear, h.perspective, b2, rng)
            sample = mixup(sample, m2, rng)
        augment_hsv(sample["img"], h.hsv_h, h.hsv_s, h.hsv_v, rng)
        sample = random_flip(sample, fliplr=h.fliplr, flipud=h.flipud, rng=rng)
        return format_sample(sample, self.imgsz, self.max_gt)


class ValTransform:
    """Validation pipeline: letterbox (scaleup=False per val convention) + Format.

    Records ratio_pad exactly as the reference does for un-letterboxing at
    metric time (augment.py:1592, consumed detect/val.py:115).
    """

    def __init__(self, imgsz: int, max_gt: int = 128):
        self.imgsz = imgsz
        self.max_gt = max_gt

    def __call__(self, sample: Dict, rng=None) -> Dict[str, np.ndarray]:
        orig_shape = sample["img"].shape[:2]
        img, ratio, (dw, dh) = letterbox(sample["img"], (self.imgsz, self.imgsz), scaleup=False)
        boxes = sample["bboxes"].copy()
        if len(boxes):
            boxes[:, :4] *= ratio[0]
            boxes[:, [0, 2]] += int(round(dw - 0.1))
            boxes[:, [1, 3]] += int(round(dh - 0.1))
        out = format_sample({"img": img, "cls": sample["cls"], "bboxes": boxes}, self.imgsz, self.max_gt)
        out["ori_shape"] = np.asarray(orig_shape, np.int32)
        out["ratio_pad"] = np.asarray([ratio[0], dw, dh], np.float32)
        return out
