"""Fused head decode: anchors + DFL integral + dist2bbox + sigmoid cls.

TPU-native equivalent of the reference Detect._inference
(/root/reference/ultralytics/nn/modules/head.py:100) and the anchor/box utils
(utils/tal.py:334 make_anchors, :349 dist2bbox). Runs as one jitted program
over fixed shapes; anchors are computed at trace time (static shapes) so they
constant-fold into the compiled executable.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_yolov11_tpu.nn.modules.block import dfl_decode


def make_anchors(shapes: Sequence[Tuple[int, int]], strides: Sequence[float], grid_cell_offset: float = 0.5):
    """Anchor centers + per-anchor stride for a list of (H, W) level shapes.

    Matches reference utils/tal.py:334: centers at (x+0.5, y+0.5) in feature
    coords, row-major over (h, w), (x, y) order.
    """
    pts, strs = [], []
    for (h, w), s in zip(shapes, strides):
        sx = np.arange(w, dtype=np.float32) + grid_cell_offset
        sy = np.arange(h, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        pts.append(np.stack((gx, gy), -1).reshape(-1, 2))
        strs.append(np.full((h * w, 1), s, np.float32))
    return jnp.asarray(np.concatenate(pts)), jnp.asarray(np.concatenate(strs))


def dist2bbox(distance: jax.Array, anchor_points: jax.Array, xywh: bool = True) -> jax.Array:
    """LTRB distances -> boxes at anchor points (reference: tal.py:349). Last-dim layout."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate((c_xy, wh), axis=-1)
    return jnp.concatenate((x1y1, x2y2), axis=-1)


def bbox2dist(anchor_points: jax.Array, bbox: jax.Array, reg_max: float) -> jax.Array:
    """xyxy boxes -> clamped LTRB distances (reference: tal.py:361)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate((anchor_points - x1y1, x2y2 - anchor_points), axis=-1), 0, reg_max - 0.01
    )


def dist2rbox(pred_dist: jax.Array, pred_angle: jax.Array, anchor_points: jax.Array) -> jax.Array:
    """LTRB + angle -> rotated box (cx, cy, w, h) (reference: tal.py:367)."""
    lt, rb = jnp.split(pred_dist, 2, axis=-1)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=-1)
    x, y = xf * cos - yf * sin, xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=-1) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=-1)


def flatten_feats(feats: List[jax.Array]) -> jax.Array:
    """[(B,H,W,no)] -> (B, A, no), matching the reference anchor ordering."""
    return jnp.concatenate([f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats], axis=1)


def decode_detections(
    feats: List[jax.Array],
    nc: int,
    strides: Sequence[float],
    reg_max: int = 16,
) -> jax.Array:
    """Raw per-level maps -> (B, A, 4+nc): xywh boxes in input pixels + sigmoid class scores.

    Pure function of the head output; jit-fuses with NMS downstream.
    """
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides)
    x = flatten_feats(feats).astype(jnp.float32)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    dist = dfl_decode(box_logits, reg_max)  # (B, A, 4)
    boxes = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    return jnp.concatenate([boxes, jax.nn.sigmoid(cls_logits)], axis=-1)


def decode_obb(
    feats: List[jax.Array],
    angle_raw: jax.Array,
    nc: int,
    strides: Sequence[float],
    reg_max: int = 16,
) -> jax.Array:
    """OBB decode: (B, A, 5+nc) = (cx, cy, w, h, angle, cls...) in pixels.

    Angle activation (sigmoid-0.25)*pi matches reference head.py OBB.forward.
    """
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides)
    x = flatten_feats(feats).astype(jnp.float32)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    angle = (jax.nn.sigmoid(angle_raw.astype(jnp.float32)) - 0.25) * np.pi
    dist = dfl_decode(box_logits, reg_max)
    rbox = dist2rbox(dist, angle, anchors[None]) * stride_t[None]
    return jnp.concatenate([rbox, angle, jax.nn.sigmoid(cls_logits)], axis=-1)


def decode_kpts(
    kpt_raw: jax.Array,
    kpt_shape: Tuple[int, int],
    shapes: Sequence[Tuple[int, int]],
    strides: Sequence[float],
) -> jax.Array:
    """Keypoint decode (reference: head.py kpts_decode): xy = (raw*2 + (anchor-0.5)) * stride."""
    anchors, stride_t = make_anchors(shapes, strides)
    b, a, _ = kpt_raw.shape
    nk, nd = kpt_shape
    y = kpt_raw.astype(jnp.float32).reshape(b, a, nk, nd)
    xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
    if nd == 3:
        conf = jax.nn.sigmoid(y[..., 2:3])
        return jnp.concatenate([xy, conf], axis=-1)
    return xy


def decode_e2e(feats: List[jax.Array], nc: int, strides: Sequence[float], reg_max: int = 16) -> jax.Array:
    """End-to-end (v10) decode: like decode_detections but boxes stay XYXY
    (reference Detect.decode_bboxes: xywh and (not end2end), head.py:146)."""
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides)
    x = flatten_feats(feats).astype(jnp.float32)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    dist = dfl_decode(box_logits, reg_max)
    boxes = dist2bbox(dist, anchors[None], xywh=False) * stride_t[None]
    return jnp.concatenate([boxes, jax.nn.sigmoid(cls_logits)], axis=-1)


def nms_free_postprocess(preds: jax.Array, max_det: int, nc: int):
    """NMS-free top-k selection (reference Detect.postprocess, head.py:150).

    preds (B, A, 4+nc) with xyxy boxes; returns (B, min(max_det, A), 6)
    [x1, y1, x2, y2, conf, cls] sorted by confidence.
    """
    B, A = preds.shape[:2]
    k = min(max_det, A)
    boxes, scores = preds[..., :4], preds[..., 4:]
    _, idx = jax.lax.top_k(scores.max(-1), k)  # (B, k) anchor pre-select
    boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    scores = jnp.take_along_axis(scores, idx[..., None], axis=1)  # (B, k, nc)
    flat = scores.reshape(B, -1)
    conf, fidx = jax.lax.top_k(flat, k)  # over anchors x classes
    sel_boxes = jnp.take_along_axis(boxes, (fidx // nc)[..., None], axis=1)
    cls = (fidx % nc).astype(jnp.float32)
    return jnp.concatenate([sel_boxes, conf[..., None], cls[..., None]], axis=-1)
