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


def split_feats(feats, reg_max: int = 16) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Normalize head output into separate (box_list, cls_list) streams.

    The Detect family keeps box and class logits as separate per-level maps —
    concatenating them into the reference's packed (B,H,W,4*reg_max+nc) layout
    (reference head.py:93 `torch.cat((box, cls), 1)`) is a torch-ism: on TPU a
    66-channel minor dim tiles to 128 lanes (~2x physical bytes) and the
    concat + downstream re-split materialize extra HBM round trips. Packed
    inputs are still accepted for compatibility (oracle tests, .pt ingest).
    """
    if isinstance(feats[0], (tuple, list)):
        return [f[0] for f in feats], [f[1] for f in feats]
    return ([f[..., : 4 * reg_max] for f in feats], [f[..., 4 * reg_max :] for f in feats])


def concat_feats(feats) -> List[jax.Array]:
    """Pack (box, cls) pairs back into the reference's per-level channel layout
    (B, H, W, 4*reg_max+nc) — for oracle comparisons / reference-format export."""
    return [jnp.concatenate(f, axis=-1) if isinstance(f, (tuple, list)) else f for f in feats]


def feat_shapes(feats) -> List[Tuple[int, int]]:
    """Per-level (H, W) of head output in either pair or packed form."""
    return [((f[0].shape[1], f[0].shape[2]) if isinstance(f, (tuple, list)) else (f.shape[1], f.shape[2]))
            for f in feats]


def decode_detections(
    feats: List[jax.Array],
    nc: int,
    strides: Sequence[float],
    reg_max: int = 16,
) -> jax.Array:
    """Raw per-level maps -> (B, A, 4+nc): xywh boxes in input pixels + sigmoid class scores.

    Pure function of the head output; jit-fuses with NMS downstream. Box and
    class streams are decoded separately (see split_feats), and DFL/sigmoid
    run PER LEVEL before the cross-level concat: both are per-anchor ops, so
    concatenating the wide (B, A, 4*reg_max) logits first — as the reference
    does (head.py:100) — only adds an extra HBM round trip of the full logits
    (~5 MB/img at 640px bs-normalized) that the decoded (B, A, 4) skips.
    """
    anchors, stride_t = make_anchors(feat_shapes(feats), strides)
    dist, scores = _decode_streams(feats, reg_max)
    boxes = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    return jnp.concatenate([boxes, scores], axis=-1)


def _decode_streams(feats, reg_max: int):
    """Per-level DFL + sigmoid, then concat the small results:
    (B, A, 4) f32 distances and (B, A, nc) f32 scores."""
    box_list, cls_list = split_feats(feats, reg_max)
    dists, scores = [], []
    for b, c in zip(box_list, cls_list):
        n = b.shape[0]
        dists.append(dfl_decode(b.reshape(n, -1, 4 * reg_max), reg_max))
        scores.append(jax.nn.sigmoid(c.reshape(n, -1, c.shape[-1])).astype(jnp.float32))
    return jnp.concatenate(dists, axis=1), jnp.concatenate(scores, axis=1)


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
    anchors, stride_t = make_anchors(feat_shapes(feats), strides)
    angle = (jax.nn.sigmoid(angle_raw.astype(jnp.float32)) - 0.25) * np.pi
    dist, scores = _decode_streams(feats, reg_max)
    rbox = dist2rbox(dist, angle, anchors[None]) * stride_t[None]
    return jnp.concatenate([rbox, angle, scores], axis=-1)


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
    anchors, stride_t = make_anchors(feat_shapes(feats), strides)
    dist, scores = _decode_streams(feats, reg_max)
    boxes = dist2bbox(dist, anchors[None], xywh=False) * stride_t[None]
    return jnp.concatenate([boxes, scores], axis=-1)


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
