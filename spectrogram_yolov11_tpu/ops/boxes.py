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
