"""Batched fixed-shape NMS — fully on-device, jit/vmap-able.

TPU-native replacement for the reference NMS pipeline
(/root/reference/ultralytics/utils/ops.py:181 non_max_suppression), which
loops per image in Python and calls torchvision's CUDA kernel with dynamic
box counts. Here every stage is static-shaped:

  decoded preds (B, A, 4+nc)
    -> top-k candidate selection (multi-label or best-class)
    -> class-offset pairwise IoU (k, k)
    -> greedy suppression as a Jacobi fixpoint (converges in chain-depth
       iterations; exact same keep-set as sequential greedy NMS / torchvision)
    -> first max_det survivors, padded

Semantics parity (reference A11): candidate gate max(cls) > conf; xywh->xyxy;
class offset cls*7680 px unless agnostic; IoU > iou_thres suppresses; output
(B, max_det, 6) = [x1, y1, x2, y2, conf, cls] with zero padding + valid mask.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy
from .iou import batch_probiou, box_iou


def _greedy_keep(iou: jnp.ndarray, valid: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-desc-sorted candidates.

    iou: (k, k) pairwise IoU (already class-offset). valid: (k,) candidate mask.
    Jacobi iteration of the greedy recurrence
        keep[i] = valid[i] and not any_{j<i}(keep[j] and iou[j,i] > t)
    reaches the unique greedy fixpoint in <= suppression-chain-depth steps;
    each step is one (k,k) masked reduction — MXU/VPU friendly, no host sync.
    """
    k = iou.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sup = (iou > iou_thres) & (row < col)  # j suppresses i only if ranked higher

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        new_keep = valid & ~suppressed
        return new_keep, jnp.any(new_keep != keep), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True), jnp.asarray(0)))
    return keep


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "nc", "multi_label", "agnostic", "max_det", "pre_nms_topk", "max_wh"),
)
def non_max_suppression(
    preds: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    nc: int = 80,
    multi_label: bool = False,
    agnostic: bool = False,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    max_wh: float = 7680.0,
    classes: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """preds (B, A, 4+nc) xywh+scores -> (out (B, max_det, 6), n_valid (B,)).

    out rows are [x1, y1, x2, y2, conf, cls], zero-padded past n_valid.
    """

    def single(p):
        boxes_xywh = p[:, :4]
        scores = p[:, 4 : 4 + nc]
        if classes is not None:
            allowed = jnp.zeros((nc,), bool).at[classes].set(True)
            scores = jnp.where(allowed[None, :], scores, 0.0)
        a = scores.shape[0]
        k = min(pre_nms_topk, a * nc if multi_label else a)
        if multi_label:
            flat = scores.reshape(-1)
            top_scores, top_idx = jax.lax.top_k(flat, k)
            anchor = top_idx // nc
            cls = (top_idx % nc).astype(jnp.float32)
        else:
            best_cls = jnp.argmax(scores, axis=-1)
            best_score = jnp.max(scores, axis=-1)
            top_scores, anchor = jax.lax.top_k(best_score, k)
            cls = best_cls[anchor].astype(jnp.float32)
        valid = top_scores > conf_thres
        boxes = xywh2xyxy(boxes_xywh[anchor])
        offset = jnp.where(agnostic, 0.0, cls * max_wh)[:, None]
        iou = box_iou(boxes + offset, boxes + offset)
        keep = _greedy_keep(iou, valid, iou_thres)

        # first max_det kept rows, preserving score order
        rank_score = jnp.where(keep, top_scores, -1.0)
        sel_scores, sel = jax.lax.top_k(rank_score, min(max_det, k))
        sel_valid = sel_scores > conf_thres
        out = jnp.concatenate(
            [boxes[sel], top_scores[sel][:, None], cls[sel][:, None]], axis=-1
        )
        out = jnp.where(sel_valid[:, None], out, 0.0)
        if max_det > k:  # pad up
            out = jnp.pad(out, ((0, max_det - k), (0, 0)))
            sel_valid = jnp.pad(sel_valid, (0, max_det - k))
        return out, jnp.sum(sel_valid.astype(jnp.int32))

    return jax.vmap(single)(preds)


@functools.partial(
    jax.jit, static_argnames=("conf_thres", "iou_thres", "nc", "max_det", "pre_nms_topk", "multi_label")
)
def non_max_suppression_extras(
    preds: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    nc: int = 80,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    multi_label: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS over (B, A, 4+nc+E): extras (mask coeffs, keypoints, ...) ride along
    with the kept boxes. Returns ((B, max_det, 6+E) [xyxy conf cls extras...],
    n_valid (B,)). Single-label candidate selection (extras are per-anchor)."""

    def single(p):
        boxes_xywh = p[:, :4]
        scores = p[:, 4 : 4 + nc]
        extra = p[:, 4 + nc :]
        a = scores.shape[0]
        k = min(pre_nms_topk, a)
        best_cls = jnp.argmax(scores, axis=-1)
        best_score = jnp.max(scores, axis=-1)
        top_scores, anchor = jax.lax.top_k(best_score, k)
        cls = best_cls[anchor].astype(jnp.float32)
        valid = top_scores > conf_thres
        boxes = xywh2xyxy(boxes_xywh[anchor])
        off = (cls * 7680.0)[:, None]
        keep = _greedy_keep(box_iou(boxes + off, boxes + off), valid, iou_thres)
        rank = jnp.where(keep, top_scores, -1.0)
        sel_scores, sel = jax.lax.top_k(rank, min(max_det, k))
        sel_valid = sel_scores > conf_thres
        out = jnp.concatenate(
            [boxes[sel], top_scores[sel][:, None], cls[sel][:, None], extra[anchor][sel]], axis=-1
        )
        out = jnp.where(sel_valid[:, None], out, 0.0)
        if max_det > k:
            out = jnp.pad(out, ((0, max_det - k), (0, 0)))
            sel_valid = jnp.pad(sel_valid, (0, max_det - k))
        return out, jnp.sum(sel_valid.astype(jnp.int32))

    return jax.vmap(single)(preds)


@functools.partial(
    jax.jit, static_argnames=("conf_thres", "iou_thres", "nc", "multi_label", "max_det", "pre_nms_topk")
)
def nms_rotated(
    preds: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    nc: int = 80,
    multi_label: bool = False,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotated-box NMS (Fast-NMS over probiou, matching reference ops.py:146).

    preds (B, A, 5+nc) = (cx, cy, w, h, angle, scores...). The reference uses
    one-shot upper-triangle suppression (not greedy) for rboxes — we mirror that.
    Returns (out (B, max_det, 7) = [cx, cy, w, h, angle, conf, cls], n_valid).
    """

    def single(p):
        rbox = p[:, :5]
        scores = p[:, 5 : 5 + nc]
        a = scores.shape[0]
        k = min(pre_nms_topk, a)
        best_cls = jnp.argmax(scores, axis=-1)
        best_score = jnp.max(scores, axis=-1)
        top_scores, anchor = jax.lax.top_k(best_score, k)
        cls = best_cls[anchor].astype(jnp.float32)
        valid = top_scores > conf_thres
        boxes = rbox[anchor]
        ious = batch_probiou(boxes, boxes)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        upper = (ious >= iou_thres) & (rowi < coli) & valid[:, None]
        keep = valid & ~jnp.any(upper, axis=0)
        rank_score = jnp.where(keep, top_scores, -1.0)
        sel_scores, sel = jax.lax.top_k(rank_score, min(max_det, k))
        sel_valid = sel_scores > conf_thres
        out = jnp.concatenate([boxes[sel], top_scores[sel][:, None], cls[sel][:, None]], axis=-1)
        out = jnp.where(sel_valid[:, None], out, 0.0)
        if max_det > k:
            out = jnp.pad(out, ((0, max_det - k), (0, 0)))
            sel_valid = jnp.pad(sel_valid, (0, max_det - k))
        return out, jnp.sum(sel_valid.astype(jnp.int32))

    return jax.vmap(single)(preds)
