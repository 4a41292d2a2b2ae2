"""Training criteria — pure jnp functions over padded batches.

Re-implementations of the reference losses
(/root/reference/ultralytics/utils/loss.py: v8DetectionLoss:172,
BboxLoss:91, DFLoss:65, v8SegmentationLoss:278, v8PoseLoss:461,
v8ClassificationLoss:616, v8OBBLoss:627) with identical reduction semantics
(SURVEY Appendix A4):

  cls  = BCE(logits, soft targets).sum() / max(target_scores.sum(), 1)
  box  = sum((1 - CIoU) * w) / target_scores_sum,  w = target_scores.sum(-1)[fg]
  dfl  = weighted two-bin cross-entropy / target_scores_sum
  total = (box*7.5 + cls*0.5 + dfl*1.5) * batch_size

GT arrives pre-padded to (b, max_gt, ...) from the data pipeline — the
reference pads inside the loss (loss.py:195); we keep shapes static end to end.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decode import bbox2dist, dist2bbox, dist2rbox, flatten_feats, make_anchors
from .iou import bbox_iou, probiou
from .tal import task_aligned_assign
from spectrogram_yolov11_tpu.nn.modules.block import dfl_decode


class Batch(NamedTuple):
    """Padded detection batch (device-resident)."""

    images: jnp.ndarray  # (b, H, W, 3) float
    cls: jnp.ndarray  # (b, max_gt) int32, 0-padded
    bboxes: jnp.ndarray  # (b, max_gt, 4) normalized xywh, 0-padded
    mask_gt: jnp.ndarray  # (b, max_gt) bool: real GT rows


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def df_loss(pred_dist_logits: jnp.ndarray, target: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution focal loss: CE on the two adjacent integer bins
    (reference: loss.py:65-88). pred_dist_logits (..., 4, reg_max),
    target (..., 4) clamped to reg_max-1-0.01. Returns (..., 1) mean over sides.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist_logits, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    return (ce_l * wl + ce_r * wr).mean(-1, keepdims=True)


def bbox_loss(
    pred_dist_logits: jnp.ndarray,  # (b, A, 4, reg_max)
    pred_bboxes: jnp.ndarray,  # (b, A, 4) xyxy grid units
    anchor_points: jnp.ndarray,  # (A, 2)
    target_bboxes: jnp.ndarray,  # (b, A, 4) xyxy grid units
    target_scores: jnp.ndarray,  # (b, A, nc)
    target_scores_sum: jnp.ndarray,
    fg_mask: jnp.ndarray,  # (b, A) bool
    reg_max: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CIoU + DFL box losses (reference: loss.py:91-128), masked not indexed."""
    weight = target_scores.sum(-1) * fg_mask  # (b, A)
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points, target_bboxes, reg_max - 1)
    ldfl = df_loss(pred_dist_logits, target_ltrb, reg_max)[..., 0]  # (b, A)
    loss_dfl = (ldfl * weight).sum() / target_scores_sum
    return loss_iou, loss_dfl


def preprocess_targets(cls, bboxes, mask_gt, imgsz: float):
    """Normalized xywh GT -> pixel xyxy + labels (reference loss.py:195-210 does
    this plus padding; padding already happened in the data pipeline)."""
    xy = bboxes[..., :2] * imgsz
    wh = bboxes[..., 2:4] * imgsz
    gt_xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    gt_xyxy = gt_xyxy * mask_gt[..., None]
    return cls[..., None], gt_xyxy, mask_gt[..., None]


@functools.partial(jax.jit, static_argnames=("nc", "reg_max", "imgsz", "strides", "hyp_box", "hyp_cls", "hyp_dfl", "tal_topk"))
def detection_loss(
    feats: List[jnp.ndarray],  # raw per-level maps (b, Hi, Wi, 4*reg_max+nc)
    cls: jnp.ndarray,  # (b, max_gt)
    bboxes: jnp.ndarray,  # (b, max_gt, 4) normalized xywh
    mask_gt: jnp.ndarray,  # (b, max_gt)
    nc: int,
    reg_max: int = 16,
    imgsz: int = 640,
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0),
    hyp_box: float = 7.5,
    hyp_cls: float = 0.5,
    hyp_dfl: float = 1.5,
    tal_topk: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v8DetectionLoss (reference: loss.py:172-275).

    Returns (total_loss_scalar, loss_items (box, cls, dfl) detached-equivalent).
    total = (box*7.5 + cls*0.5 + dfl*1.5) * batch_size.
    """
    b = feats[0].shape[0]
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = make_anchors(shapes, strides)  # (A,2), (A,1)

    x = flatten_feats(feats).astype(jnp.float32)  # (b, A, no)
    pred_dist_logits = x[..., : 4 * reg_max].reshape(b, -1, 4, reg_max)
    pred_scores = x[..., 4 * reg_max :]

    # decode to xyxy in grid units (reference bbox_decode loss.py:212)
    pd = jax.nn.softmax(pred_dist_logits, axis=-1) @ jnp.arange(reg_max, dtype=jnp.float32)
    pred_bboxes = dist2bbox(pd, anchor_points[None], xywh=False)  # (b, A, 4) grid units

    gt_labels, gt_xyxy_px, mask_gt3 = preprocess_targets(cls, bboxes, mask_gt, float(imgsz))

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t,
        gt_labels,
        gt_xyxy_px,
        mask_gt3,
        topk=tal_topk,
        num_classes=nc,
    )
    target_bboxes = assign.target_bboxes / stride_t[None]
    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)

    loss_cls = _bce_logits(pred_scores, assign.target_scores).sum() / target_scores_sum
    loss_iou, loss_dfl = bbox_loss(
        pred_dist_logits, pred_bboxes, anchor_points, target_bboxes,
        assign.target_scores, target_scores_sum, assign.fg_mask, reg_max,
    )
    # items carry the gains, matching reference logging (loss.py:271-275)
    items = jnp.stack([hyp_box * loss_iou, hyp_cls * loss_cls, hyp_dfl * loss_dfl])
    total = items.sum() * b
    return total, items


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain softmax cross-entropy, mean reduction (reference: loss.py:616)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
    return nll, jnp.stack([nll])
