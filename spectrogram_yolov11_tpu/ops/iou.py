"""IoU family (jnp, broadcast-friendly).

Semantics and constants match the reference exactly
(/root/reference/ultralytics/utils/metrics.py: bbox_iou:171 with eps=1e-7,
box_iou:52, probiou:298) — CIoU drives both the TAL assigner metric and the
box loss, so its eps placement and the no-grad alpha matter for parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (N,4) x (M,4) -> (N,M)."""
    a1, a2 = jnp.split(box1[..., :, None, :4], 2, axis=-1)  # (N,1,2)
    b1, b2 = jnp.split(box2[..., None, :, :4], 2, axis=-1)  # (1,M,2)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = jnp.clip(a2 - a1, 0, None).prod(-1)
    area2 = jnp.clip(b2 - b1, 0, None).prod(-1)
    return inter / (area1 + area2 - inter + eps)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise (aligned, broadcastable) IoU of box pairs, last dim = 4.

    Matches reference bbox_iou exactly, including the xyxy-mode `+ eps` on
    heights only (metrics.py:202-203).
    Returns shape broadcast(box1[..., 0], box2[..., 0]).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1x1, b1x2, b1y1, b1y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2x1, b2x2, b2y1, b2y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, -1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    # reference metrics.py bbox_iou adds eps only to the heights in xyxy mode
    union = w1 * h1 + w2 * h2 - inter + eps

    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou.squeeze(-1)

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return (iou - (rho2 / c2 + v * alpha)).squeeze(-1)
        return (iou - rho2 / c2).squeeze(-1)
    c_area = cw * ch + eps
    return (iou - (c_area - union) / c_area).squeeze(-1)


def _rbox_covariance(boxes: jnp.ndarray):
    """Covariance terms of rotated boxes (cx, cy, w, h, angle) (reference: metrics.py:278)."""
    gbbs = jnp.concatenate([boxes[..., 2:4] ** 2 / 12, boxes[..., 4:5]], axis=-1)
    a, b, c = gbbs[..., 0], gbbs[..., 1], gbbs[..., 2]
    cos, sin = jnp.cos(c), jnp.sin(c)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, CIoU: bool = False, eps: float = 1e-7) -> jnp.ndarray:
    """Gaussian-Bhattacharyya IoU for aligned rotated boxes (reference: metrics.py:298)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _rbox_covariance(obb1)
    a2, b2, c2 = _rbox_covariance(obb2)

    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.5
    t3 = jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0, None) * jnp.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    ) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def batch_probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise probiou: (N,5) x (M,5) -> (N,M) (reference: metrics.py:344)."""
    return probiou(obb1[..., :, None, :], obb2[..., None, :, :], eps=eps)


def mask_iou(mask1: jnp.ndarray, mask2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(N, HW) x (M, HW) binary masks -> (N, M) IoU (reference: metrics.py:237)."""
    inter = jnp.matmul(mask1.astype(jnp.float32), mask2.astype(jnp.float32).T)
    union = mask1.sum(-1)[:, None] + mask2.sum(-1)[None] - inter
    return inter / (union + eps)


def kpt_iou(kpt1: jnp.ndarray, kpt2: jnp.ndarray, area: jnp.ndarray, sigma, eps: float = 1e-7) -> jnp.ndarray:
    """OKS between GT (N,K,3) and pred (M,K,2|3) keypoints (reference: metrics.py:256)."""
    d = (kpt1[:, None, :, 0] - kpt2[None, :, :, 0]) ** 2 + (kpt1[:, None, :, 1] - kpt2[None, :, :, 1]) ** 2
    sigma = jnp.asarray(sigma, jnp.float32)
    kpt_mask = kpt1[..., 2] != 0  # (N, K)
    e = d / ((2 * sigma) ** 2) / (area[:, None, None] + eps) / 2
    oks = jnp.exp(-e) * kpt_mask[:, None]
    return oks.sum(-1) / (kpt_mask.sum(-1)[:, None] + eps)


def bbox_ioa(box1, box2, iou: bool = False, eps: float = 1e-7):
    """Intersection over box2 area, (n, 4) x (m, 4) xyxy -> (n, m); with
    iou=True this is standard pairwise IoU (reference: utils/metrics.py
    bbox_ioa:20 — used by CopyPaste occlusion filtering). Numpy host-side."""
    import numpy as np

    b1 = np.asarray(box1, np.float32).T
    b2 = np.asarray(box2, np.float32).T
    inter = (np.minimum(b1[2][:, None], b2[2]) - np.maximum(b1[0][:, None], b2[0])).clip(0) * \
            (np.minimum(b1[3][:, None], b2[3]) - np.maximum(b1[1][:, None], b2[1])).clip(0)
    area = (b2[2] - b2[0]) * (b2[3] - b2[1])
    if iou:
        area = area + ((b1[2] - b1[0]) * (b1[3] - b1[1]))[:, None] - inter
    return inter / (area + eps)
