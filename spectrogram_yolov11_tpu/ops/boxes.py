"""Box coordinate ops (jnp, shape-polymorphic over leading dims).

Mirrors the semantics of the reference box utilities
(/root/reference/ultralytics/utils/ops.py: xyxy2xywh:412 family,
scale_boxes:92, clip_boxes:335) — the letterbox inverse uses the exact
round(pad - 0.1) convention so mAP matches to the pixel.
Functions accept jnp or numpy arrays and stay in that namespace where possible.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _ns(x):
    return jnp if isinstance(x, jnp.ndarray) else np


def xywh2xyxy(x):
    ns = _ns(x)
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return ns.concatenate([xy - half, xy + half, x[..., 4:]], axis=-1)


def xyxy2xywh(x):
    ns = _ns(x)
    x1y1, x2y2 = x[..., :2], x[..., 2:4]
    return ns.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1, x[..., 4:]], axis=-1)


def xywhn2xyxy(x, w: int, h: int, padw: float = 0.0, padh: float = 0.0):
    """Normalized xywh -> pixel xyxy (reference: ops.py:447)."""
    ns = _ns(x)
    cx, cy, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return ns.stack(
        [w * (cx - bw / 2) + padw, h * (cy - bh / 2) + padh, w * (cx + bw / 2) + padw, h * (cy + bh / 2) + padh],
        axis=-1,
    )


def xyxy2xywhn(x, w: int, h: int, clip: bool = False, eps: float = 0.0):
    ns = _ns(x)
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    y = xyxy2xywh(x)
    return y / ns.asarray([w, h, w, h] + [1] * (y.shape[-1] - 4), dtype=y.dtype)


def clip_boxes(boxes, shape: Tuple[int, int]):
    """Clip xyxy boxes to image shape (h, w), preserving trailing columns
    (conf/cls etc.) like the reference clip_boxes (ops.py:335)."""
    ns = _ns(boxes)
    h, w = shape[:2]
    clipped = ns.stack(
        [
            ns.clip(boxes[..., 0], 0, w),
            ns.clip(boxes[..., 1], 0, h),
            ns.clip(boxes[..., 2], 0, w),
            ns.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )
    if boxes.shape[-1] > 4:
        clipped = ns.concatenate([clipped, boxes[..., 4:]], axis=-1)
    return clipped


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True, xywh: bool = False):
    """Rescale boxes from letterboxed img1_shape back to img0_shape
    (reference: ops.py:92 — including the round(pad/2 - 0.1) convention)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    boxes = np.array(boxes, dtype=np.float32, copy=True)
    if padding:
        boxes[..., 0] -= pad[0]
        boxes[..., 1] -= pad[1]
        if not xywh:
            boxes[..., 2] -= pad[0]
            boxes[..., 3] -= pad[1]
    boxes[..., :4] /= gain
    return clip_boxes(boxes, img0_shape)


def empty_like(x):
    return np.empty_like(x) if isinstance(x, np.ndarray) else jnp.empty_like(x)


def regularize_rboxes(rboxes):
    """Canonicalize xywhr boxes: long edge as w, angle in [0, pi)
    (reference: ops.py:791)."""
    ns = _ns(rboxes)
    x, y, w, h, t = (rboxes[..., i] for i in range(5))
    swap = w > h
    w_ = ns.where(swap, w, h)
    h_ = ns.where(swap, h, w)
    t = ns.where(swap, t, t + math.pi / 2) % math.pi
    return ns.stack([x, y, w_, h_, t], axis=-1)


def xywhr2xyxyxyxy(x):
    """(..., 5) cx cy w h angle(rad) -> (..., 4, 2) corner points (reference:
    ops.py xywhr2xyxyxyxy:572). Works in the input's namespace (np or jnp)."""
    ns = _ns(x)
    ctr = x[..., :2]
    w, h, angle = x[..., 2:3], x[..., 3:4], x[..., 4:5]
    cos, sin = ns.cos(angle), ns.sin(angle)
    vec1 = ns.concatenate([w / 2 * cos, w / 2 * sin], axis=-1)
    vec2 = ns.concatenate([-h / 2 * sin, h / 2 * cos], axis=-1)
    return ns.stack([ctr + vec1 + vec2, ctr + vec1 - vec2,
                     ctr - vec1 - vec2, ctr - vec1 + vec2], axis=-2)


def xyxyxyxy2xywhr(x):
    """(n, 8) or (n, 4, 2) corner points -> (n, 5) cx cy w h angle(rad) via
    min-area rects (reference: ops.py xyxyxyxy2xywhr:560 — cv2.minAreaRect is
    the spec because augmented polygons may not be perfect rectangles).
    Host-side numpy only."""
    import cv2

    pts = np.asarray(x, np.float32).reshape(len(x), -1, 2)
    out = np.empty((len(pts), 5), np.float32)
    for i, p in enumerate(pts):
        (cx, cy), (w, h), ang = cv2.minAreaRect(p)
        out[i] = (cx, cy, w, h, ang / 180 * np.pi)
    return out


def segment2box(segment, width: int = 640, height: int = 640):
    """One (n, 2) polygon -> its xyxy box over the in-image points (reference:
    ops.py segment2box:65, incl. the clip-first rule when >=3 sides overflow)."""
    seg = np.asarray(segment)
    x, y = seg[:, 0], seg[:, 1]
    if int(x.min() < 0) + int(y.min() < 0) + int(x.max() > width) + int(y.max() > height) >= 3:
        x, y = x.clip(0, width), y.clip(0, height)
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    if not len(x):
        return np.zeros(4, dtype=seg.dtype)
    return np.array([x.min(), y.min(), x.max(), y.max()], dtype=seg.dtype)


def segments2boxes(segments):
    """List of (n, 2) polygons -> (N, 4) xywh boxes (reference: ops.py
    segments2boxes:660)."""
    boxes = np.array([[s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()]
                      for s in segments], np.float32).reshape(-1, 4)
    return xyxy2xywh(boxes)


def clip_coords(coords, shape: Tuple[int, int]):
    """Clip (..., 2+) xy[+extras] coordinates to an image (h, w) (reference:
    ops.py clip_coords:360). Pure (returns a new array; the torch reference
    mutates); trailing channels (e.g. keypoint visibility) pass through."""
    ns = _ns(coords)
    xy = ns.stack([ns.clip(coords[..., 0], 0, shape[1]),
                   ns.clip(coords[..., 1], 0, shape[0])], axis=-1)
    return ns.concatenate([xy, coords[..., 2:]], axis=-1) if coords.shape[-1] > 2 else xy


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None, normalize: bool = False,
                 padding: bool = True):
    """Un-letterbox (..., 2) xy coordinates from img1_shape to img0_shape
    (reference: ops.py scale_coords:736 — keypoints/segment counterpart of
    scale_boxes)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    ns = _ns(coords)
    xy = coords[..., :2]
    if padding:
        xy = xy - ns.asarray([pad[0], pad[1]], coords.dtype)
    xy = xy / gain
    out = ns.concatenate([xy, coords[..., 2:]], axis=-1) if coords.shape[-1] > 2 else xy
    out = clip_coords(out, img0_shape)
    if normalize:
        scale = ns.asarray([img0_shape[1], img0_shape[0]], coords.dtype)
        out = ns.concatenate([out[..., :2] / scale, out[..., 2:]], axis=-1) \
            if coords.shape[-1] > 2 else out / scale
    return out
