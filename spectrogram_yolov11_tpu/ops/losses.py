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
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.modules.block import dfl_decode
from .decode import bbox2dist, dist2bbox, dist2rbox, feat_shapes, flatten_feats, make_anchors, split_feats
from .iou import bbox_iou, probiou
from .metrics import OKS_SIGMA
from .tal import task_aligned_assign


class Batch(NamedTuple):
    """Padded detection batch (device-resident)."""

    images: jnp.ndarray  # (b, H, W, 3) float
    cls: jnp.ndarray  # (b, max_gt) int32, 0-padded
    bboxes: jnp.ndarray  # (b, max_gt, 4) normalized xywh, 0-padded
    mask_gt: jnp.ndarray  # (b, max_gt) bool: real GT rows


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def varifocal_loss(pred_score, gt_score, label, alpha: float = 0.75, gamma: float = 2.0) -> jnp.ndarray:
    """Varifocal loss, Zhang et al. (reference: loss.py:16-37).

    pred_score logits (b, N, C); gt_score IoU-aware soft targets; label 0/1
    positive mask. Returns the reference's mean(1).sum() reduction."""
    w = alpha * jax.nn.sigmoid(pred_score) ** gamma * (1.0 - label) + gt_score * label
    return (_bce_logits(pred_score, gt_score) * w).mean(1).sum()


def focal_loss(pred, label, gamma: float = 1.5, alpha: float = 0.25) -> jnp.ndarray:
    """Binary focal loss over logits (reference: loss.py:40-62, TF-addons form)."""
    loss = _bce_logits(pred, label)
    p = jax.nn.sigmoid(pred)
    p_t = label * p + (1.0 - label) * (1.0 - p)
    loss = loss * (1.0 - p_t) ** gamma
    if alpha > 0:
        loss = loss * (label * alpha + (1.0 - label) * (1.0 - alpha))
    return loss.mean(1).sum()


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
    # one-hot contraction instead of take_along_axis: a dynamic gather on the
    # minor (lane) axis lowers catastrophically on TPU — XLA charged ~280 GB
    # per gather here at bs64 (round-3 loss profile); the masked reduction is
    # three streaming passes over the same tensor.
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    ce_l = -jnp.sum(logp * (bins == tl[..., None]), axis=-1)
    ce_r = -jnp.sum(logp * (bins == jnp.clip(tr, 0, reg_max - 1)[..., None]), axis=-1)
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
    box_list, cls_list = split_feats(feats, reg_max)
    b = box_list[0].shape[0]
    anchor_points, stride_t = make_anchors(feat_shapes(feats), strides)  # (A,2), (A,1)

    box_flat = flatten_feats(box_list).astype(jnp.float32)  # (b, A, 4*reg_max)
    pred_dist_logits = box_flat.reshape(b, -1, 4, reg_max)
    pred_scores = flatten_feats(cls_list).astype(jnp.float32)  # (b, A, nc)

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


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside xyxy boxes via the arange trick
    (reference: ops.py:660). masks (..., h, w), boxes (..., 4) in mask pixels."""
    h, w = masks.shape[-2:]
    x1, y1, x2, y2 = jnp.split(boxes[..., None, :], 4, axis=-1)  # (..., 1, 1) each
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2)  # (..., h, w)
    return masks * inside


def _assign_for_feats(feats, cls, bboxes, mask_gt, nc, reg_max, imgsz, strides, tal_topk=10):
    """Shared front half of all detect-family losses: flatten, decode, assign."""
    box_list, cls_list = split_feats(feats, reg_max)
    b = box_list[0].shape[0]
    anchor_points, stride_t = make_anchors(feat_shapes(feats), strides)
    box_flat = flatten_feats(box_list).astype(jnp.float32)
    pred_dist_logits = box_flat.reshape(b, -1, 4, reg_max)
    pred_scores = flatten_feats(cls_list).astype(jnp.float32)
    # lane-friendly matmul decode (see dfl_decode) instead of softmax on the
    # minor-16 view; pred_dist_logits keeps the (b, A, 4, reg_max) view for
    # df_loss's per-bin cross-entropy.
    pd = dfl_decode(box_flat, reg_max)
    pred_bboxes = dist2bbox(pd, anchor_points[None], xywh=False)
    gt_labels, gt_xyxy_px, mask_gt3 = preprocess_targets(cls, bboxes, mask_gt, float(imgsz))
    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t,
        gt_labels, gt_xyxy_px, mask_gt3,
        topk=tal_topk, num_classes=nc,
    )
    return anchor_points, stride_t, pred_dist_logits, pred_scores, pred_bboxes, assign


@functools.partial(
    jax.jit,
    static_argnames=("nc", "reg_max", "imgsz", "strides", "hyp_box", "hyp_cls", "hyp_dfl", "max_fg", "overlap"),
)
def segmentation_loss(
    feats: List[jnp.ndarray],
    mask_coeffs: jnp.ndarray,  # (b, A, nm)
    proto: jnp.ndarray,  # (b, hm, wm, nm)
    cls: jnp.ndarray,
    bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    gt_masks: jnp.ndarray,  # (b, hm, wm) index-encoded: pixel = gt_idx+1, 0 = bg
    nc: int,
    reg_max: int = 16,
    imgsz: int = 640,
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0),
    hyp_box: float = 7.5,
    hyp_cls: float = 0.5,
    hyp_dfl: float = 1.5,
    max_fg: int = 128,
    overlap: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v8SegmentationLoss (reference: loss.py:278-458): detect losses + per-fg
    BCE(coeff @ proto vs instance mask) cropped to the box, / box area.

    TPU deviation (documented): the per-image fg set is capped at `max_fg`
    anchors (highest target-score first) so the mask einsum keeps a static
    shape; the reference iterates all fg anchors dynamically.
    """
    anchor_points, stride_t, pdl, pred_scores, pred_bboxes, assign = _assign_for_feats(
        feats, cls, bboxes, mask_gt, nc, reg_max, imgsz, strides
    )
    b = pred_scores.shape[0]
    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    loss_cls = _bce_logits(pred_scores, assign.target_scores).sum() / target_scores_sum
    loss_iou, loss_dfl = bbox_loss(
        pdl, pred_bboxes, anchor_points, assign.target_bboxes / stride_t[None],
        assign.target_scores, target_scores_sum, assign.fg_mask, reg_max,
    )

    # ---- mask branch ----
    hm, wm, nm = proto.shape[1], proto.shape[2], proto.shape[3]
    score_rank = jnp.where(assign.fg_mask, assign.target_scores.sum(-1), -1.0)
    _, sel = jax.lax.top_k(score_rank, max_fg)  # (b, max_fg) anchor ids
    sel_fg = jnp.take_along_axis(assign.fg_mask, sel, axis=1)  # (b, max_fg)
    sel_gt_idx = jnp.take_along_axis(assign.target_gt_idx, sel, axis=1)
    sel_coeff = jnp.take_along_axis(mask_coeffs.astype(jnp.float32), sel[..., None], axis=1)  # (b,K,nm)
    sel_boxes_px = jnp.take_along_axis(assign.target_bboxes, sel[..., None], axis=1)  # (b,K,4) pixels

    pred_masks = jnp.einsum("bkn,bhwn->bkhw", sel_coeff, proto.astype(jnp.float32))
    if overlap:
        gt_m = (gt_masks[:, None, :, :] == (sel_gt_idx[..., None, None] + 1)).astype(jnp.float32)
    else:
        gt_m = jnp.take_along_axis(gt_masks, sel_gt_idx[..., None, None], axis=1).astype(jnp.float32)

    bce = _bce_logits(pred_masks, gt_m)  # (b,K,hm,wm)
    boxes_m = sel_boxes_px * (hm / float(imgsz))  # to mask pixels
    cropped = crop_mask(bce, boxes_m)
    area = jnp.clip((boxes_m[..., 2] - boxes_m[..., 0]) * (boxes_m[..., 3] - boxes_m[..., 1]), 1.0, None)
    per_anchor = cropped.sum(axis=(-2, -1)) / area  # == crop(BCE).mean over box pixels
    loss_mask = (per_anchor * sel_fg).sum() / jnp.maximum(sel_fg.sum(), 1.0)

    items = jnp.stack([hyp_box * loss_iou, hyp_box * loss_mask, hyp_cls * loss_cls, hyp_dfl * loss_dfl])
    return items.sum() * b, items


def keypoint_loss_terms(pred_xy, gt_xy, kpt_mask, area, sigmas):
    """Per-entry OKS keypoint-location loss terms (reference KeypointLoss.forward,
    loss.py:155-170: `e = d / ((2*sigmas)^2 * (area + 1e-9) * 2)`, cocoeval form).

    Shapes: pred_xy/gt_xy (..., nk, 2), kpt_mask (..., nk), area (..., 1),
    sigmas (nk,). Returns (..., nk) terms; the reference's scalar loss is
    `terms.mean()` over flattened fg entries, which equals the masked
    per-anchor mean reduction used by pose_loss.
    """
    d2 = ((pred_xy - gt_xy) ** 2).sum(-1)
    e = d2 / (2 * sigmas) ** 2 / (area + 1e-9) / 2
    kpt_loss_factor = kpt_mask.shape[-1] / (jnp.sum(kpt_mask != 0, axis=-1, keepdims=True) + 1e-9)
    return (1 - jnp.exp(-e)) * kpt_mask * kpt_loss_factor


@functools.partial(
    jax.jit,
    static_argnames=("nc", "kpt_shape", "reg_max", "imgsz", "strides", "hyp_box", "hyp_cls", "hyp_dfl", "hyp_pose", "hyp_kobj"),
)
def pose_loss(
    feats: List[jnp.ndarray],
    pred_kpts_raw: jnp.ndarray,  # (b, A, nk*nd)
    cls: jnp.ndarray,
    bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    gt_kpts: jnp.ndarray,  # (b, max_gt, nk, nd) normalized xy (+v)
    nc: int,
    kpt_shape: Tuple[int, int] = (17, 3),
    reg_max: int = 16,
    imgsz: int = 640,
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0),
    hyp_box: float = 7.5,
    hyp_cls: float = 0.5,
    hyp_dfl: float = 1.5,
    hyp_pose: float = 12.0,
    hyp_kobj: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v8PoseLoss (reference: loss.py:461-613): detect losses + OKS-style
    keypoint location loss + keypoint-visibility BCE, masked over fg anchors."""
    nk, nd = kpt_shape
    anchor_points, stride_t, pdl, pred_scores, pred_bboxes, assign = _assign_for_feats(
        feats, cls, bboxes, mask_gt, nc, reg_max, imgsz, strides
    )
    b = pred_scores.shape[0]
    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    loss_cls = _bce_logits(pred_scores, assign.target_scores).sum() / target_scores_sum
    loss_iou, loss_dfl = bbox_loss(
        pdl, pred_bboxes, anchor_points, assign.target_bboxes / stride_t[None],
        assign.target_scores, target_scores_sum, assign.fg_mask, reg_max,
    )

    # decode kpts in grid units (reference: v8PoseLoss.kpts_decode)
    y = pred_kpts_raw.astype(jnp.float32).reshape(b, -1, nk, nd)
    xy = y[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    # GT kpts to grid units of each anchor's stride
    gt_xy_px = gt_kpts[..., :2] * imgsz  # (b, max_gt, nk, 2) pixels
    # one-hot matmul instead of a (b*A)-row gather (20-40 ns/row on TPU —
    # see ops/tal.py target assembly + round-5 xplane profile)
    idx_onehot = jax.nn.one_hot(assign.target_gt_idx, gt_kpts.shape[1], dtype=jnp.float32)  # (b, A, max_gt)
    sel_gt_kpts = jnp.einsum("bag,bgkc->bakc", idx_onehot, gt_xy_px)  # (b, A, nk, 2)
    sel_gt_kpts = sel_gt_kpts / stride_t[None, :, None, :]
    if nd == 3:
        gt_v = jnp.einsum("bag,bgk->bak", idx_onehot, gt_kpts[..., 2])  # (b, A, nk)
        kpt_mask = (gt_v != 0).astype(jnp.float32)
    else:
        kpt_mask = jnp.ones(xy.shape[:-1], jnp.float32)

    tb = assign.target_bboxes / stride_t[None]  # grid units xyxy
    area = jnp.clip((tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]), 1e-9, None)[..., None]
    sigmas = jnp.full((nk,), 1.0 / nk, jnp.float32)  # reference OKS_SIGMA when nk==17, else uniform
    if nk == 17:
        sigmas = jnp.asarray(OKS_SIGMA, jnp.float32)
    loc = keypoint_loss_terms(xy, sel_gt_kpts, kpt_mask, area, sigmas)
    fgw = assign.fg_mask.astype(jnp.float32)
    n_fg = jnp.maximum(fgw.sum(), 1.0)
    loss_kpt = (loc.mean(-1) * fgw).sum() / n_fg
    if nd == 3:
        vis_logit = y[..., 2]
        loss_kobj = (_bce_logits(vis_logit, kpt_mask).mean(-1) * fgw).sum() / n_fg
    else:
        loss_kobj = jnp.zeros(())

    items = jnp.stack(
        [hyp_box * loss_iou, hyp_pose * loss_kpt, hyp_kobj * loss_kobj, hyp_cls * loss_cls, hyp_dfl * loss_dfl]
    )
    return items.sum() * b, items


@functools.partial(
    jax.jit,
    static_argnames=("nc", "reg_max", "imgsz", "strides", "hyp_box", "hyp_cls", "hyp_dfl"),
)
def obb_loss(
    feats: List[jnp.ndarray],
    pred_angle: jnp.ndarray,  # (b, A, 1) raw
    cls: jnp.ndarray,
    bboxes: jnp.ndarray,  # (b, max_gt, 5) normalized cx cy w h + angle(rad)
    mask_gt: jnp.ndarray,
    nc: int,
    reg_max: int = 16,
    imgsz: int = 640,
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0),
    hyp_box: float = 7.5,
    hyp_cls: float = 0.5,
    hyp_dfl: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v8OBBLoss (reference: loss.py:627-740): rotated TAL (probiou metric) +
    (1 - probiou) box loss + DFL on the unrotated extent."""
    box_list, cls_list = split_feats(feats, reg_max)
    b = box_list[0].shape[0]
    anchor_points, stride_t = make_anchors(feat_shapes(feats), strides)
    pred_dist_logits = flatten_feats(box_list).astype(jnp.float32).reshape(b, -1, 4, reg_max)
    pred_scores = flatten_feats(cls_list).astype(jnp.float32)
    angle = (jax.nn.sigmoid(pred_angle.astype(jnp.float32)) - 0.25) * np.pi  # (b, A, 1)
    pd = jax.nn.softmax(pred_dist_logits, axis=-1) @ jnp.arange(reg_max, dtype=jnp.float32)
    pred_rbox = dist2rbox(pd, angle, anchor_points[None])  # grid units (cx cy w h)

    gt_cxywh = bboxes[..., :4] * imgsz
    gt_angle = bboxes[..., 4:5]
    gt_rbox_px = jnp.concatenate([gt_cxywh, gt_angle], axis=-1) * mask_gt[..., None]
    gt_labels = cls[..., None]

    pred_rbox_px = jnp.concatenate([pred_rbox * stride_t[None], angle], axis=-1)
    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_rbox_px),
        anchor_points * stride_t,
        gt_labels, gt_rbox_px, mask_gt[..., None],
        num_classes=nc, rotated=True,
    )
    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    loss_cls = _bce_logits(pred_scores, assign.target_scores).sum() / target_scores_sum

    tb = assign.target_bboxes  # (b, A, 5) pixels
    tb_grid = jnp.concatenate([tb[..., :4] / stride_t[None], tb[..., 4:5]], axis=-1)
    weight = assign.target_scores.sum(-1) * assign.fg_mask
    pred_full = jnp.concatenate([pred_rbox, angle], axis=-1)
    iou = jnp.clip(probiou(pred_full, tb_grid), 0, None)
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum
    # DFL on the axis-aligned extent of the target rbox (reference RotatedBboxLoss)
    half = tb_grid[..., 2:4] / 2
    txyxy = jnp.concatenate([tb_grid[..., :2] - half, tb_grid[..., :2] + half], axis=-1)
    target_ltrb = bbox2dist(anchor_points, txyxy, reg_max - 1)
    ldfl = df_loss(pred_dist_logits, target_ltrb, reg_max)[..., 0]
    loss_dfl = (ldfl * weight).sum() / target_scores_sum

    items = jnp.stack([hyp_box * loss_iou, hyp_cls * loss_cls, hyp_dfl * loss_dfl])
    return items.sum() * b, items


def e2e_detection_loss(
    out: dict,
    cls: jnp.ndarray,
    bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    nc: int,
    reg_max: int = 16,
    imgsz: int = 640,
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0),
    hyp_box: float = 7.5,
    hyp_cls: float = 0.5,
    hyp_dfl: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E2EDetectLoss (reference: utils/loss.py:743-758): one2many branch with
    TAL topk=10 + one2one branch with topk=1; totals and items summed."""
    t1, i1 = detection_loss(out["one2many"], cls, bboxes, mask_gt, nc=nc, reg_max=reg_max, imgsz=imgsz,
                            strides=strides, hyp_box=hyp_box, hyp_cls=hyp_cls, hyp_dfl=hyp_dfl, tal_topk=10)
    t2, i2 = detection_loss(out["one2one"], cls, bboxes, mask_gt, nc=nc, reg_max=reg_max, imgsz=imgsz,
                            strides=strides, hyp_box=hyp_box, hyp_cls=hyp_cls, hyp_dfl=hyp_dfl, tal_topk=1)
    return t1 + t2, i1 + i2
