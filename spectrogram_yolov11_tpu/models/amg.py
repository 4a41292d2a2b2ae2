"""Automatic mask generation helpers for SAM's segment-everything mode.

numpy counterpart of /root/reference/ultralytics/models/sam/amg.py (the
reference runs these on torch tensors; here the variable-length filtering is
host-side numpy while the heavy prompt decoding stays in one fixed-shape
jitted program — see models/sam.py SAMPredictor.generate).
"""

from __future__ import annotations

import math
from itertools import product
from typing import List, Tuple

import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced (x, y) grid in [0,1]^2 -> (n^2, 2) (reference amg.py:62)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    px = np.tile(pts[None, :], (n_per_side, 1))
    py = np.tile(pts[:, None], (1, n_per_side))
    return np.stack([px, py], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int, scale_per_layer: int) -> List[np.ndarray]:
    """Per-crop-layer point grids (reference amg.py:71)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer**i))) for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int, overlap_ratio: float):
    """Layered overlapping crop boxes in xyxy + their layer ids (reference amg.py:76)."""
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        cw, ch = crop_len(im_w, n_side, overlap), crop_len(im_h, n_side, overlap)
        x0s = [int((cw - overlap) * i) for i in range(n_side)]
        y0s = [int((ch - overlap) * i) for i in range(n_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def calculate_stability_score(mask_logits: np.ndarray, mask_threshold: float, offset: float) -> np.ndarray:
    """IoU of the +offset / -offset thresholdings (reference amg.py:32)."""
    inter = (mask_logits > (mask_threshold + offset)).sum(axis=(-2, -1))
    union = (mask_logits > (mask_threshold - offset)).sum(axis=(-2, -1))
    return inter / np.maximum(union, 1)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """xyxy boxes around binary masks; empty masks -> zeros (reference amg.py:162)."""
    if masks.size == 0:
        return np.zeros((*masks.shape[:-2], 4), np.float32)
    shape = masks.shape
    h, w = shape[-2:]
    m = masks.reshape(-1, h, w).astype(bool)
    in_h = m.any(axis=-1)  # (N, h)
    in_w = m.any(axis=-2)  # (N, w)
    hc = in_h * np.arange(h)[None]
    wc = in_w * np.arange(w)[None]
    bottom = hc.max(axis=-1)
    top = (hc + h * ~in_h).min(axis=-1)
    right = wc.max(axis=-1)
    left = (wc + w * ~in_w).min(axis=-1)
    empty = (right < left) | (bottom < top)
    out = np.stack([left, top, right, bottom], axis=-1).astype(np.float32)
    out[empty] = 0
    return out.reshape(*shape[:-2], 4)


def is_box_near_crop_edge(boxes: np.ndarray, crop_box, orig_box, atol: float = 20.0) -> np.ndarray:
    """True where a box hugs the crop edge but not the image edge (reference amg.py:11)."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    b = uncrop_boxes_xyxy(boxes, crop_box).astype(np.float32)
    near_crop = np.isclose(b, crop[None], atol=atol, rtol=0)
    near_image = np.isclose(b, orig[None], atol=atol, rtol=0)
    return (near_crop & ~near_image).any(axis=1)


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + np.asarray([[x0, y0, x0, y0]], boxes.dtype)


def uncrop_points(points: np.ndarray, crop_box) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return points + np.asarray([[x0, y0]], points.dtype)


def uncrop_masks(masks: np.ndarray, crop_box, orig_h: int, orig_w: int) -> np.ndarray:
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    out = np.zeros((*masks.shape[:-2], orig_h, orig_w), masks.dtype)
    out[..., y0:y1, x0:x1] = masks
    return out


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str) -> Tuple[np.ndarray, bool]:
    """Drop small islands or fill small holes (reference amg.py:142)."""
    import cv2

    assert mode in {"holes", "islands"}
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill] or [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def batch_iterator(batch_size: int, *args):
    """Fixed-size slices over equal-length arrays (reference amg.py:24)."""
    assert args and all(len(a) == len(args[0]) for a in args)
    n = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n):
        yield [a[b * batch_size : (b + 1) * batch_size] for a in args]


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Plain numpy greedy NMS over xyxy boxes -> kept indices (host-side; the
    candidate count here is tiny vs the detector path's on-device NMS)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= iou_thres]
    return np.asarray(keep, np.int64)
