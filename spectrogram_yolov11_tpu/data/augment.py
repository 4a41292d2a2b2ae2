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
from typing import Dict, List, Tuple

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
    compose_image: bool = True,
) -> Dict:
    """4-image mosaic onto a 2s x 2s canvas (reference: augment.py:490-700).

    Center (xc, yc) ~ U(s/2, 3s/2) via border = -s/2; tiles clipped to canvas;
    labels (boxes / polygons / keypoints) offset by the tile's (padw, padh).

    compose_image=False (device-augment mode, ops/device_augment.py): the
    canvas is never built on host — the sample instead carries ``tiles``
    (padded source stack + canvas rects + offsets) for the TPU compositor.
    Label math and rng draw order are identical in both modes.
    """
    s = imgsz
    border = (-s // 2, -s // 2)
    yc, xc = (int(rng.uniform(-b, 2 * s + b)) for b in border)
    canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8) if compose_image else None
    tiles_src = None if compose_image else np.zeros((4, s, s, 3), np.uint8)
    tiles_reg = np.zeros((4, 4), np.int32)
    tiles_pad = np.zeros((4, 2), np.int32)
    has_seg = "segments" in samples[0]
    has_kpt = "keypoints" in samples[0]
    cls_out, box_out, seg_out, kpt_out = [], [], [], []
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
        if compose_image:
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        else:
            tiles_src[i, :h, :w] = img
            tiles_reg[i] = (x1a, y1a, x2a, y2a)
            tiles_pad[i] = (x1a - x1b, y1a - y1b)
        padw, padh = x1a - x1b, y1a - y1b
        if len(sample["cls"]):
            b = sample["bboxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            box_out.append(b)
            cls_out.append(sample["cls"])
            if has_seg:
                seg_out.extend([p + np.asarray([padw, padh], np.float32) for p in sample["segments"]])
            if has_kpt:
                k = sample["keypoints"].copy()
                k[..., 0] += padw
                k[..., 1] += padh
                kpt_out.append(k)
    cls_cat = np.concatenate(cls_out) if cls_out else np.zeros((0,), np.int32)
    box_cat = np.concatenate(box_out) if box_out else np.zeros((0, 4), np.float32)
    box_cat = np.clip(box_cat, 0, 2 * s)
    out = {"img": canvas, "cls": cls_cat, "bboxes": box_cat, "mosaic_border": border}
    if not compose_image:
        out["img_shape"] = (s * 2, s * 2)
        out["tiles"] = {"src": tiles_src, "regions": tiles_reg, "pads": tiles_pad}
    if has_seg:
        out["segments"] = seg_out
    if has_kpt:
        nk = samples[0]["keypoints"].shape[1] if kpt_out or not samples[0]["keypoints"].size else 0
        out["keypoints"] = np.concatenate(kpt_out) if kpt_out else np.zeros((0, nk, 3), np.float32)
    return out


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
    warp_image: bool = True,
) -> Dict:
    """Single combined warp M = T @ S @ R @ P @ C with box transform and
    candidate filtering (reference: augment.py:952-1258).

    warp_image=False (device-augment mode): the cv2 image warp is skipped —
    M is recorded on the sample as ``warp_M`` for the on-device sampler
    (ops/device_augment.py); label math and rng draws are unchanged.
    """
    rng = rng or np.random.default_rng()
    img = sample["img"]
    in_h, in_w = img.shape[:2] if img is not None else sample["img_shape"]
    h = in_h + border[0] * 2
    w = in_w + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -in_w / 2
    C[1, 2] = -in_h / 2

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
    if warp_image and ((border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any()):
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    def warp_pts(pts: np.ndarray) -> np.ndarray:
        xy = np.ones((len(pts), 3))
        xy[:, :2] = pts
        xy = xy @ M.T
        return (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).astype(np.float32)

    boxes = sample["bboxes"]
    cls = sample["cls"]
    segments = sample.get("segments")
    keypoints = sample.get("keypoints")
    if len(boxes):
        n = len(boxes)
        if segments is not None and len(segments):
            # boxes re-derived from warped polygons (reference: augment.py:1104)
            segments = [warp_pts(p) for p in segments]
            new = np.stack(
                [np.concatenate([p.min(0).clip([0, 0], [w, h]), p.max(0).clip([0, 0], [w, h])]) for p in segments]
            ).astype(np.float32)
        else:
            xy = warp_pts(boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        if keypoints is not None and len(keypoints):
            nk = keypoints.shape[1]
            flat = warp_pts(keypoints[..., :2].reshape(-1, 2)).reshape(-1, nk, 2)
            vis = keypoints[..., 2:3].copy() if keypoints.shape[-1] == 3 else np.ones((*flat.shape[:2], 1), np.float32)
            outside = (flat[..., 0] < 0) | (flat[..., 0] > w) | (flat[..., 1] < 0) | (flat[..., 1] > h)
            vis[outside] = 0
            keypoints = np.concatenate([flat, vis], axis=-1).astype(np.float32)
        keep = box_candidates(boxes.T * s, new.T, area_thr=0.01 if segments is not None and len(segments) else 0.10)
        boxes, cls = new[keep].astype(np.float32), cls[keep]
        if segments is not None and len(segments):
            segments = [p for p, k in zip(segments, keep) if k]
        if keypoints is not None and len(keypoints):
            keypoints = keypoints[keep]
    out = {"img": img, "cls": cls, "bboxes": boxes}
    if not warp_image:
        out["warp_M"] = M
        out["img_shape"] = (h, w)
        if "tiles" in sample:
            out["tiles"] = sample["tiles"]
    if segments is not None:
        out["segments"] = segments if len(boxes) else []
    if keypoints is not None:
        out["keypoints"] = keypoints if len(boxes) else np.zeros((0,) + (sample["keypoints"].shape[1], 3), np.float32)
    return out


def draw_hsv_gains(hgain: float, sgain: float, vgain: float, rng) -> np.ndarray:
    """Draw the HSV LUT gains exactly as augment_hsv does (same rng order);
    used by the device-augment path where the image work runs on TPU."""
    if hgain or sgain or vgain:
        return (rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1).astype(np.float32)
    return np.ones(3, np.float32)


def random_flip(sample: Dict, fliplr: float = 0.5, flipud: float = 0.0, rng=None, flip_idx=None,
                flip_image: bool = True) -> Dict:
    """Horizontal/vertical flips with box/polygon/keypoint updates
    (reference: augment.py:1383; flip_idx swaps left/right keypoints).

    flip_image=False (device-augment mode): image flips are folded into the
    on-device warp matrix instead; the applied flips are recorded on the
    sample as ``flips`` = (flipud_applied, fliplr_applied)."""
    rng = rng or np.random.default_rng()
    img, boxes = sample["img"], sample["bboxes"]
    segments = sample.get("segments")
    keypoints = sample.get("keypoints")
    h, w = img.shape[:2] if img is not None else sample["img_shape"]
    did_ud = did_lr = False
    if flipud and rng.random() < flipud:
        did_ud = True
        if flip_image:
            img = np.flipud(img)
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
            if segments is not None:
                segments = [np.stack([p[:, 0], h - p[:, 1]], 1) for p in segments]
            if keypoints is not None and len(keypoints):
                keypoints = keypoints.copy()
                keypoints[..., 1] = h - keypoints[..., 1]
    if fliplr and rng.random() < fliplr:
        did_lr = True
        if flip_image:
            img = np.fliplr(img)
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
            if segments is not None:
                segments = [np.stack([w - p[:, 0], p[:, 1]], 1) for p in segments]
            if keypoints is not None and len(keypoints):
                keypoints = keypoints.copy()
                keypoints[..., 0] = w - keypoints[..., 0]
                if flip_idx is not None:
                    keypoints = keypoints[:, list(flip_idx)]
    out = {"img": np.ascontiguousarray(img) if img is not None else None, "cls": sample["cls"], "bboxes": boxes}
    if not flip_image:
        out["flips"] = (did_ud, did_lr)
        for k in ("warp_M", "img_shape", "tiles"):
            if k in sample:
                out[k] = sample[k]
    if segments is not None:
        out["segments"] = segments
    if keypoints is not None:
        out["keypoints"] = keypoints
    return out


def copy_paste(sample: Dict, p: float = 0.5, rng=None) -> Dict:
    """Segment copy-paste, 'flip' mode (reference: augment.py:1634): mirror the
    image left-right; instances whose mirrored box overlaps existing boxes by
    IoA < 0.30 are pasted (pixels + labels). Needs polygon segments."""
    segments = sample.get("segments")
    if not segments or p <= 0:
        return sample
    rng = rng or np.random.default_rng()
    img = sample["img"]
    h, w = img.shape[:2]
    boxes = sample["bboxes"]
    n = len(boxes)
    flipped_boxes = boxes.copy()
    flipped_boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    # IoA of each flipped box vs all existing boxes
    x1 = np.maximum(flipped_boxes[:, None, 0], boxes[None, :, 0])
    y1 = np.maximum(flipped_boxes[:, None, 1], boxes[None, :, 1])
    x2 = np.minimum(flipped_boxes[:, None, 2], boxes[None, :, 2])
    y2 = np.minimum(flipped_boxes[:, None, 3], boxes[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = np.clip(boxes[:, 2] - boxes[:, 0], 1e-9, None) * np.clip(boxes[:, 3] - boxes[:, 1], 1e-9, None)
    ioa = inter / area[None]
    candidates = np.nonzero((ioa < 0.30).all(1))[0]
    k = round(p * len(candidates))
    if k == 0:
        return sample
    chosen = rng.choice(candidates, k, replace=False)
    im_flipped = img[:, ::-1]
    mask = np.zeros((h, w), np.uint8)
    new_cls, new_boxes, new_segs = [], [], []
    for j in chosen:
        seg_f = segments[j].copy()
        seg_f[:, 0] = w - seg_f[:, 0]
        cv2.fillPoly(mask, [seg_f.astype(np.int32)], 1)
        new_cls.append(sample["cls"][j])
        new_boxes.append(flipped_boxes[j])
        new_segs.append(seg_f)
    img = img.copy()
    img[mask.astype(bool)] = im_flipped[mask.astype(bool)]
    out = dict(sample)
    out["img"] = img
    out["cls"] = np.concatenate([sample["cls"], np.asarray(new_cls, sample["cls"].dtype)])
    out["bboxes"] = np.concatenate([boxes, np.stack(new_boxes)])
    out["segments"] = list(segments) + new_segs
    if "keypoints" in sample and len(sample["keypoints"]):
        kf = sample["keypoints"][chosen].copy()
        kf[..., 0] = w - kf[..., 0]
        out["keypoints"] = np.concatenate([sample["keypoints"], kf])
    return out


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


def format_sample(
    sample: Dict, imgsz: int, max_gt: int, bgr2rgb: bool = True, task: str = "detect", mask_ratio: int = 4,
    kpt_shape: Tuple[int, int] = (17, 3),
) -> Dict[str, np.ndarray]:
    """Final Format step (reference: augment.py:1926): HWC BGR uint8 ->
    HWC RGB float-ready image + normalized labels padded to max_gt.
    (We keep HWC — NHWC is the TPU-native layout; the reference converts to CHW.)

    task-specific extras:
      segment: index-encoded instance mask at imgsz/mask_ratio (overlap
               encoding, reference data/utils.py:257 polygons2masks_overlap)
      pose:    normalized (nk, 3) keypoints padded to max_gt
      obb:     boxes become (cx, cy, w, h, angle) from min-area rects of the
               4-point polygons (reference ops.py xyxyxyxy2xywhr)
    """
    img = sample["img"]
    if img is None:  # device-augment mode: image assembled on TPU
        h, w = sample["img_shape"]
    else:
        h, w = img.shape[:2]
        if bgr2rgb:
            img = img[..., ::-1]
    boxes = sample["bboxes"]
    cls = sample["cls"]
    n = min(len(boxes), max_gt)
    out: Dict[str, np.ndarray] = {}
    cls_pad = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)

    if task == "obb":
        box_pad = np.zeros((max_gt, 5), np.float32)
        polys = sample.get("segments", [])
        good_rows = []
        for i in range(n):
            p = np.asarray(polys[i], np.float32)
            (cx, cy), (bw, bh), ang = cv2.minAreaRect(p)
            if bw < 2 or bh < 2:
                continue
            ang = ang / 180 * np.pi
            if bw < bh:  # canonical le90-ish form: long side first
                bw, bh = bh, bw
                ang += np.pi / 2
            ang = (ang + np.pi / 2) % np.pi - np.pi / 2
            k = len(good_rows)
            box_pad[k] = [cx / w, cy / h, bw / w, bh / h, ang]
            cls_pad[k] = cls[i]
            good_rows.append(i)
        mask[: len(good_rows)] = True
        out = {"cls": cls_pad, "bboxes": box_pad, "mask_gt": mask}
        if img is not None:
            out["img"] = np.ascontiguousarray(img)
        return out

    box_pad = np.zeros((max_gt, 4), np.float32)
    keep_idx = []
    if n:
        b = boxes[:n].astype(np.float32)
        xywh = np.stack(
            [(b[:, 0] + b[:, 2]) / 2 / w, (b[:, 1] + b[:, 3]) / 2 / h, (b[:, 2] - b[:, 0]) / w, (b[:, 3] - b[:, 1]) / h],
            axis=1,
        )
        good = (xywh[:, 2] > 0) & (xywh[:, 3] > 0)
        keep_idx = list(np.where(good)[0])
        k = len(keep_idx)
        box_pad[:k] = xywh[good]
        cls_pad[:k] = cls[:n][good]
        mask[:k] = True
    out = {"cls": cls_pad, "bboxes": box_pad, "mask_gt": mask}
    if img is not None:
        out["img"] = np.ascontiguousarray(img)

    if task == "segment":
        mh, mw = imgsz // mask_ratio, imgsz // mask_ratio
        inst = np.zeros((mh, mw), np.int32)
        polys = sample.get("segments", [])
        sx, sy = mw / w, mh / h
        for new_i, i in enumerate(keep_idx):
            p = (np.asarray(polys[i], np.float32) * [sx, sy]).astype(np.int32)
            cv2.fillPoly(inst, [p], int(new_i) + 1)
        out["masks"] = inst
    elif task == "pose":
        nk, nd = kpt_shape
        kpt_pad = np.zeros((max_gt, nk, 3), np.float32)
        kpts = sample.get("keypoints")
        if kpts is not None and len(kpts):
            for new_i, i in enumerate(keep_idx):
                kp = kpts[i].copy()
                kp[:, 0] /= w
                kp[:, 1] /= h
                kpt_pad[new_i] = kp
        out["keypoints"] = kpt_pad
    return out


def _pad_labels(sample: Dict, dw: float, dh: float) -> Dict:
    """Shift all label geometry by the letterbox padding offsets."""
    px, py = int(round(dw - 0.1)), int(round(dh - 0.1))
    boxes = sample["bboxes"].copy()
    if len(boxes):
        boxes[:, [0, 2]] += px
        boxes[:, [1, 3]] += py
    out = dict(sample, bboxes=boxes)
    if "segments" in sample:
        out["segments"] = [p + np.asarray([px, py], np.float32) for p in sample["segments"]]
    if "keypoints" in sample and len(sample["keypoints"]):
        k = sample["keypoints"].copy()
        k[..., 0] += px
        k[..., 1] += py
        out["keypoints"] = k
    return out


class Albumentations:
    """Pixel-level Albumentations hook (reference: augment.py:1735).

    Availability-gated exactly like the reference: if the albumentations
    package is missing (it is not in this TPU image) the hook is a no-op.
    Only non-spatial transforms are composed (Blur/MedianBlur/ToGray/CLAHE at
    p=0.01), so boxes/segments/keypoints never move.
    """

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A

            self.transform = A.Compose([
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
            ])
            from spectrogram_yolov11_tpu.utils import LOGGER

            LOGGER.info("albumentations: " + ", ".join(
                f"{t}".replace("always_apply=False, ", "") for t in self.transform.transforms if t.p))
        except ImportError:  # package not installed -> inert hook
            pass
        except Exception as e:  # pragma: no cover - bad albumentations install
            from spectrogram_yolov11_tpu.utils import LOGGER

            LOGGER.warning(f"albumentations: init failed: {e}")

    def __call__(self, sample: Dict, rng=None) -> Dict:
        if self.transform is None:
            return sample
        rng = rng or np.random.default_rng()
        if rng.random() < self.p:
            sample["img"] = self.transform(image=sample["img"])["image"]
        return sample


class TrainTransform:
    """v8_transforms-equivalent pipeline (reference: augment.py:2278):
    Mosaic -> RandomPerspective -> (MixUp) -> Albumentations -> HSV -> flips,
    then Format."""

    def __init__(self, dataset, imgsz: int, hyp, max_gt: int = 128, task: str = "detect",
                 kpt_shape=(17, 3), flip_idx=None, mask_ratio: int = 4, device_mode: bool = False):
        self.dataset = dataset
        self.imgsz = imgsz
        self.hyp = hyp
        self.max_gt = max_gt
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.flip_idx = flip_idx
        self.mask_ratio = mask_ratio
        self.mosaic_enabled = True
        self.albumentations = Albumentations(p=1.0)
        # device_mode: the image half of the pipeline (mosaic composite, warp,
        # HSV, flips) runs on the TPU inside the train step
        # (ops/device_augment.py); the host keeps decode/resize + label math.
        # Only valid when the host-only image stages are inert.
        if device_mode:
            blockers = []
            if getattr(hyp, "mixup", 0):
                blockers.append("mixup>0")
            if getattr(hyp, "copy_paste", 0) and task in {"segment", "obb"}:
                blockers.append("copy_paste>0")
            if self.albumentations.transform is not None:
                blockers.append("albumentations active")
            if blockers:
                from spectrogram_yolov11_tpu.utils import LOGGER

                LOGGER.warning(f"device_augment: falling back to host augmentation ({', '.join(blockers)})")
                device_mode = False
        self.device_mode = device_mode

    def close_mosaic(self):
        self.mosaic_enabled = False

    def _mosaic(self, idx: int, rng) -> Dict:
        idxs = [idx] + list(rng.integers(0, len(self.dataset), 3))
        samples = [self.dataset.load_sample(i, square_to=self.imgsz) for i in idxs]
        return mosaic4(samples, self.imgsz, rng)

    def __call__(self, idx: int, rng) -> Dict[str, np.ndarray]:
        if self.device_mode:
            return self._call_device(idx, rng)
        h = self.hyp
        use_mosaic = self.mosaic_enabled and rng.random() < h.mosaic
        if use_mosaic:
            sample = self._mosaic(idx, rng)
            border = sample.pop("mosaic_border")
        else:
            sample = self.dataset.load_sample(idx, square_to=self.imgsz)
            img, _, (dw, dh) = letterbox(sample["img"], (self.imgsz, self.imgsz), scaleup=True)
            sample = dict(_pad_labels(sample, dw, dh), img=img)
            border = (0, 0)
        if h.copy_paste and "segments" in sample:
            sample = copy_paste(sample, p=h.copy_paste, rng=rng)
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
            m2 = self._mosaic(int(rng.integers(0, len(self.dataset))), rng)
            b2 = m2.pop("mosaic_border")
            m2 = random_perspective(m2, h.degrees, h.translate, h.scale, h.shear, h.perspective, b2, rng)
            sample = mixup(sample, m2, rng)
        sample = self.albumentations(sample, rng=rng)
        augment_hsv(sample["img"], h.hsv_h, h.hsv_s, h.hsv_v, rng)
        sample = random_flip(sample, fliplr=h.fliplr, flipud=h.flipud, rng=rng, flip_idx=self.flip_idx)
        return format_sample(sample, self.imgsz, self.max_gt, task=self.task,
                             mask_ratio=self.mask_ratio, kpt_shape=self.kpt_shape)

    def _call_device(self, idx: int, rng) -> Dict[str, np.ndarray]:
        """Device-augment variant: identical label math + rng draw order as
        __call__, but the image stages become parameters for
        ops/device_augment.augment_batch (run on TPU inside the train step)."""
        h = self.hyp
        s = self.imgsz
        use_mosaic = self.mosaic_enabled and rng.random() < h.mosaic
        if use_mosaic:
            idxs = [idx] + list(rng.integers(0, len(self.dataset), 3))
            samples = [self.dataset.load_sample(i, square_to=s) for i in idxs]
            sample = mosaic4(samples, s, rng, compose_image=False)
            border = sample.pop("mosaic_border")
        else:
            raw = self.dataset.load_sample(idx, square_to=s)
            img, _, (dw, dh) = letterbox(raw["img"], (s, s), scaleup=True)
            sample = dict(_pad_labels(raw, dw, dh))
            src = np.zeros((4, s, s, 3), np.uint8)
            src[0] = img
            regions = np.zeros((4, 4), np.int32)
            regions[0] = (0, 0, s, s)
            sample["img"] = None
            sample["img_shape"] = (s, s)
            sample["tiles"] = {"src": src, "regions": regions, "pads": np.zeros((4, 2), np.int32)}
            border = (0, 0)
        sample = random_perspective(
            sample, degrees=h.degrees, translate=h.translate, scale=h.scale,
            shear=h.shear, perspective=h.perspective, border=border, rng=rng, warp_image=False,
        )
        hsv_r = draw_hsv_gains(h.hsv_h, h.hsv_s, h.hsv_v, rng)
        sample = random_flip(sample, fliplr=h.fliplr, flipud=h.flipud, rng=rng,
                             flip_idx=self.flip_idx, flip_image=False)
        out = format_sample(sample, s, self.max_gt, task=self.task,
                            mask_ratio=self.mask_ratio, kpt_shape=self.kpt_shape)
        # output-index -> canvas-coord matrix: M^-1 composed with the flip
        # index reflections (flips act on the warped image, so they apply
        # FIRST on the inverse path)
        A = np.linalg.inv(sample["warp_M"])
        did_ud, did_lr = sample["flips"]
        if did_lr:
            F = np.eye(3)
            F[0, 0], F[0, 2] = -1.0, s - 1
            A = A @ F
        if did_ud:
            F = np.eye(3)
            F[1, 1], F[1, 2] = -1.0, s - 1
            A = A @ F
        tiles = sample["tiles"]
        out["aug_src"] = tiles["src"]
        out["aug_regions"] = tiles["regions"]
        out["aug_pads"] = tiles["pads"]
        out["aug_inv"] = A.astype(np.float32)
        out["aug_hsv"] = hsv_r
        return out


class ValTransform:
    """Validation pipeline: letterbox (scaleup=False per val convention) + Format.

    Records ratio_pad exactly as the reference does for un-letterboxing at
    metric time (augment.py:1592, consumed detect/val.py:115).
    """

    def __init__(self, imgsz: int, max_gt: int = 128, task: str = "detect", kpt_shape=(17, 3), mask_ratio: int = 4):
        self.imgsz = imgsz
        self.max_gt = max_gt
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.mask_ratio = mask_ratio

    def __call__(self, sample: Dict, rng=None) -> Dict[str, np.ndarray]:
        orig_shape = sample["img"].shape[:2]
        img, ratio, (dw, dh) = letterbox(sample["img"], (self.imgsz, self.imgsz), scaleup=False)
        s = dict(sample)
        boxes = sample["bboxes"].copy()
        if len(boxes):
            boxes[:, :4] *= ratio[0]
        s["bboxes"] = boxes
        if "segments" in s:
            s["segments"] = [p * ratio[0] for p in s["segments"]]
        if "keypoints" in s and len(s["keypoints"]):
            k = s["keypoints"].copy()
            k[..., :2] *= ratio[0]
            s["keypoints"] = k
        s = dict(_pad_labels(s, dw, dh), img=img)
        out = format_sample(s, self.imgsz, self.max_gt, task=self.task,
                            mask_ratio=self.mask_ratio, kpt_shape=self.kpt_shape)
        out["ori_shape"] = np.asarray(orig_shape, np.int32)
        out["ratio_pad"] = np.asarray([ratio[0], dw, dh], np.float32)
        return out
