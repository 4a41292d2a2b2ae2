"""RT-DETR / DETR losses: Hungarian matching, Varifocal/Focal, CDN denoising.

TPU-native counterpart of the reference DETR loss stack
(/root/reference/ultralytics/models/utils/loss.py: DETRLoss:13,
RTDETRDetectionLoss:291; models/utils/ops.py: HungarianMatcher:12,
get_cdn_group:150; utils/loss.py: VarifocalLoss:16, FocalLoss:40).

Design (fixed shapes, one jitted program):
- GT arrives padded (B, max_gt) + validity mask — the cost tensors are dense
  (B, nq, max_gt) with invalid columns masked, so every batch compiles to the
  same XLA program regardless of GT counts.
- The Hungarian assignment itself is the one inherently-sequential scalar
  algorithm in the stack; it runs on host via jax.pure_callback (scipy
  linear_sum_assignment over (nq, n_i) slices), returning a fixed-shape
  (B, max_gt) row-index map. Everything before (costs) and after (gathers,
  losses) stays on device. The callback carries no gradient (the reference
  detaches predictions inside the matcher too).
- Contrastive denoising (get_cdn_group) becomes `make_cdn_batch`, a pure
  jnp function over the padded GT with a STATIC group geometry
  (num_group x dn_max_nums slots), so dn queries have a fixed width instead
  of the reference's batch-max-dependent width.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import xywh2xyxy, xyxy2xywh
from .iou import bbox_iou

MATCH_GAINS = {"class": 2.0, "bbox": 5.0, "giou": 2.0}  # HungarianMatcher cost_gain
LOSS_GAINS = {"class": 1.0, "bbox": 5.0, "giou": 2.0}  # DETRLoss loss_gain


def focal_loss(pred_logits, label, gamma: float = 1.5, alpha: float = 0.25):
    """Reference FocalLoss.forward (utils/loss.py:40): returns loss.mean(1).sum()."""
    bce = _bce_logits(pred_logits, label)
    p = jax.nn.sigmoid(pred_logits)
    p_t = label * p + (1 - label) * (1 - p)
    loss = bce * (1.0 - p_t) ** gamma
    if alpha > 0:
        loss = loss * (label * alpha + (1 - label) * (1 - alpha))
    return loss.mean(1).sum()


def varifocal_loss(pred_logits, gt_score, label, alpha: float = 0.75, gamma: float = 2.0):
    """Reference VarifocalLoss.forward (utils/loss.py:16)."""
    weight = alpha * jax.nn.sigmoid(pred_logits) ** gamma * (1 - label) + gt_score * label
    return (_bce_logits(pred_logits, gt_score) * weight).mean(1).sum()


def _bce_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _lsa_host(cost: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Host-side per-image linear sum assignment. cost (B, nq, G), counts (B,).
    Returns rows (B, G): the query index matched to each valid gt slot."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, np.float32)
    counts = np.asarray(counts)
    b, nq, g = cost.shape
    out = np.zeros((b, g), np.int32)
    for i in range(b):
        n = int(counts[i])
        if n == 0:
            continue
        c = np.nan_to_num(cost[i, :, :n], nan=0.0, posinf=0.0, neginf=0.0)
        rows, cols = linear_sum_assignment(c)
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_match(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt):
    """Optimal bipartite assignment (reference HungarianMatcher.forward).

    pred_bboxes (B, nq, 4) normalized xywh; pred_scores (B, nq, nc) logits;
    gt_* padded (B, G, ...); mask_gt (B, G) bool.
    Returns rows (B, G) int32 — query index per gt slot (valid slots only).
    """
    pred_bboxes = jax.lax.stop_gradient(pred_bboxes)
    pred_scores = jax.lax.stop_gradient(pred_scores)
    b, nq, nc = pred_scores.shape
    g = gt_cls.shape[1]
    ps = jax.nn.sigmoid(pred_scores)  # use_fl=True
    ps_gt = jnp.take_along_axis(ps, gt_cls[:, None, :].astype(jnp.int32), axis=2)  # (B, nq, G)
    alpha, gamma = 0.25, 2.0
    pos = alpha * ((1 - ps_gt) ** gamma) * (-jnp.log(ps_gt + 1e-8))
    neg = (1 - alpha) * (ps_gt**gamma) * (-jnp.log(1 - ps_gt + 1e-8))
    cost_class = pos - neg
    cost_bbox = jnp.abs(pred_bboxes[:, :, None] - gt_bboxes[:, None]).sum(-1)  # (B, nq, G)
    giou = bbox_iou(pred_bboxes[:, :, None], gt_bboxes[:, None], xywh=True, GIoU=True)
    cost = MATCH_GAINS["class"] * cost_class + MATCH_GAINS["bbox"] * cost_bbox + MATCH_GAINS["giou"] * (1.0 - giou)
    counts = mask_gt.astype(jnp.int32).sum(-1)
    if _host_callbacks_supported():
        # valid GTs are packed first (dataset pads at the tail), so slicing
        # [:n] in the host callback addresses exactly the valid columns
        return jax.pure_callback(
            _lsa_host, jax.ShapeDtypeStruct((b, g), jnp.int32), cost, counts, vmap_method="sequential"
        )
    # the axon TPU backend has no host send/recv ("UNIMPLEMENTED: host
    # callbacks"), so exact scipy LSA is unreachable from inside jit there.
    # Device fallback: greedy global-minimum matching — repeatedly take the
    # lowest-cost (query, gt) pair and mask its row+column. Not provably
    # optimal like Hungarian, but a standard tight approximation for DETR
    # matching costs; CPU training/tests keep the exact path above.
    return _greedy_match(cost, mask_gt)


def _greedy_match(cost, mask_gt):
    """(B, nq, G) costs -> (B, G) query index per gt, greedy global-min order."""
    b, nq, g = cost.shape
    big = jnp.float32(1e9)
    cost = jnp.where(mask_gt[:, None, :], cost.astype(jnp.float32), big)

    def body(_, state):
        c, rows = state
        flat = c.reshape(b, nq * g)
        idx = jnp.argmin(flat, axis=1)            # (B,) flattened (query, gt) argmin
        q, col = idx // g, idx % g
        valid = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0] < big
        bidx = jnp.arange(b)
        rows = rows.at[bidx, col].set(jnp.where(valid, q.astype(jnp.int32), rows[bidx, col]))
        c = c.at[bidx, q, :].set(jnp.where(valid[:, None], big, c[bidx, q, :]))
        c = c.at[bidx, :, col].set(jnp.where(valid[:, None], big, c[bidx, :, col]))
        return c, rows

    _, rows = jax.lax.fori_loop(0, g, body, (cost, jnp.zeros((b, g), jnp.int32)))
    return rows


import functools


@functools.lru_cache(maxsize=1)
def _host_callbacks_supported() -> bool:
    """pure_callback needs host send/recv, which the tunneled axon PJRT
    backend does not implement (it raises UNIMPLEMENTED; it also reports
    default_backend() == 'tpu', so probe the capability instead of the name)."""
    import numpy as _np

    try:
        out = jax.jit(
            lambda x: jax.pure_callback(lambda y: y, jax.ShapeDtypeStruct((), jnp.float32), x)
        )(jnp.float32(1.0))
        return bool(_np.asarray(out) == 1.0)
    except Exception:
        return False


def _layer_loss(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt, nc: int, rows=None):
    """One decoder layer's (class, bbox, giou) losses (reference _get_loss)."""
    if rows is None:
        rows = hungarian_match(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt)
    b, nq = pred_scores.shape[:2]
    g = gt_cls.shape[1]
    validf = mask_gt.astype(jnp.float32)
    num_gts = validf.sum()

    matched_box = jnp.take_along_axis(pred_bboxes, rows[..., None], axis=1)  # (B, G, 4)
    l1 = jnp.abs(matched_box - gt_bboxes).sum(-1) * validf
    giou_m = bbox_iou(matched_box, gt_bboxes, xywh=True, GIoU=True)
    denom = jnp.maximum(num_gts, 1.0)
    loss_bbox = LOSS_GAINS["bbox"] * l1.sum() / denom
    loss_giou = LOSS_GAINS["giou"] * ((1.0 - giou_m) * validf).sum() / denom

    # targets (B, nq): background nc everywhere; matched rows take the gt class.
    # min-scatter: valid classes (< nc) win over the background writes that
    # invalid (padded) slots direct at row 0.
    bidx = jnp.arange(b)[:, None]
    cls_write = jnp.where(mask_gt, gt_cls.astype(jnp.int32), nc)
    targets = jnp.full((b, nq), nc, jnp.int32).at[bidx, rows].min(cls_write)
    iou_plain = jax.lax.stop_gradient(bbox_iou(matched_box, gt_bboxes, xywh=True)) * validf
    gt_scores = jnp.zeros((b, nq), jnp.float32).at[bidx, rows].max(iou_plain)

    one_hot = jax.nn.one_hot(targets, nc + 1)[..., :nc]
    gt_sc = gt_scores[..., None] * one_hot
    # RTDETRDetectionLoss: use_vfl=True — Varifocal when GTs exist, Focal otherwise
    vfl = varifocal_loss(pred_scores, gt_sc, one_hot)
    fl = focal_loss(pred_scores, one_hot)
    loss_cls = jnp.where(num_gts > 0, vfl, fl) / denom * nq
    return LOSS_GAINS["class"] * loss_cls, loss_bbox, loss_giou


def _dn_rows(num_group: int, max_nums: int):
    """Deterministic dn match: pos slot (g, j) <-> tiled gt (g, j). With the
    [pos tiles | neg tiles] layout the row map is simply arange."""
    return np.arange(num_group * max_nums, dtype=np.int32)


def make_cdn_attn_mask(num_dn: int, nq: int, num_group: int, max_nums: int) -> np.ndarray:
    """Static attention mask (reference get_cdn_group, models/utils/ops.py:236):
    matching queries cannot see dn queries; dn groups cannot see each other."""
    tgt = num_dn + nq
    m = np.zeros((tgt, tgt), bool)
    m[num_dn:, :num_dn] = True
    for i in range(num_group):
        lo, hi = max_nums * 2 * i, max_nums * 2 * (i + 1)
        if i == 0:
            m[lo:hi, hi:num_dn] = True
        elif i == num_group - 1:
            m[lo:hi, : max_nums * i * 2] = True
        else:
            m[lo:hi, hi:num_dn] = True
            m[lo:hi, :lo] = True
    return m


def make_cdn_batch(
    key,
    gt_cls,
    gt_bboxes,
    mask_gt,
    nc: int,
    num_group: int,
    max_nums: int,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
):
    """Contrastive denoising queries over padded GT (reference get_cdn_group).

    Returns dn_cls (B, 2*G*M) int32, dn_bbox logit-space (B, 2*G*M, 4),
    dn_valid (B, 2*G*M) bool. Layout: [pos tiles x G | neg tiles x G], each
    tile max_nums wide.
    """
    cls_c = gt_cls[:, :max_nums].astype(jnp.int32)
    box_c = gt_bboxes[:, :max_nums]
    m_c = mask_gt[:, :max_nums]
    reps = 2 * num_group
    dn_cls = jnp.tile(cls_c, (1, reps))
    dn_box = jnp.tile(box_c, (1, reps, 1))
    dn_valid = jnp.tile(m_c, (1, reps))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if cls_noise_ratio > 0:
        flip = jax.random.uniform(k1, dn_cls.shape) < (cls_noise_ratio * 0.5)
        new_label = jax.random.randint(k2, dn_cls.shape, 0, nc)
        dn_cls = jnp.where(flip, new_label, dn_cls)
    if box_noise_scale > 0:
        known = xywh2xyxy(dn_box)
        diff = jnp.tile(dn_box[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        rand_sign = jax.random.randint(k3, dn_box.shape, 0, 2).astype(jnp.float32) * 2.0 - 1.0
        rand_part = jax.random.uniform(k4, dn_box.shape)
        is_neg = (jnp.arange(reps * max_nums) >= num_group * max_nums).astype(jnp.float32)
        rand_part = (rand_part + is_neg[None, :, None]) * rand_sign
        known = jnp.clip(known + rand_part * diff, 0.0, 1.0)
        noised = xyxy2xywh(known)
        dn_box = jnp.log(jnp.clip(noised, 1e-6, None) / jnp.clip(1.0 - noised, 1e-6, None))
    return dn_cls, dn_box, dn_valid


@functools.partial(jax.jit, static_argnames=("nc", "num_dn", "num_group", "dn_max_nums"))
def rtdetr_loss(
    outputs: dict,
    gt_cls,
    gt_bboxes,
    mask_gt,
    nc: int,
    num_dn: int = 0,
    num_group: int = 1,
    dn_max_nums: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Total RT-DETR loss (reference RTDETRDetectionLoss.forward + DETRLoss).

    outputs: head training dict {dec_bboxes (L,B,Q,4), dec_scores (L,B,Q,nc),
    enc_bboxes (B,nq,4), enc_scores (B,nq,nc)}; Q = num_dn + nq.
    Returns (total, items [giou, class, bbox] of the final matching layer).
    """
    dec_bboxes, dec_scores = outputs["dec_bboxes"], outputs["dec_scores"]
    if num_dn:
        dn_bboxes, dec_bboxes = dec_bboxes[:, :, :num_dn], dec_bboxes[:, :, num_dn:]
        dn_scores, dec_scores = dec_scores[:, :, :num_dn], dec_scores[:, :, num_dn:]
    # prepend the encoder head as layer 0 of the aux stack (reference tasks.py:584)
    all_bboxes = jnp.concatenate([outputs["enc_bboxes"][None], dec_bboxes], axis=0)
    all_scores = jnp.concatenate([outputs["enc_scores"][None], dec_scores], axis=0)

    L = all_bboxes.shape[0]
    total = jnp.zeros(())
    items = jnp.zeros(3)
    for i in range(L):
        lc, lb, lg = _layer_loss(all_bboxes[i], all_scores[i], gt_bboxes, gt_cls, mask_gt, nc)
        total = total + lc + lb + lg
        if i == L - 1:  # the main (final-layer) loss items
            items = jnp.stack([lg, lc, lb])

    if num_dn:
        rows = jnp.broadcast_to(jnp.asarray(_dn_rows(num_group, dn_max_nums))[None], (gt_cls.shape[0], num_group * dn_max_nums))
        gt_cls_dn = jnp.tile(gt_cls[:, :dn_max_nums], (1, num_group))
        gt_box_dn = jnp.tile(gt_bboxes[:, :dn_max_nums], (1, num_group, 1))
        mask_dn = jnp.tile(mask_gt[:, :dn_max_nums], (1, num_group))
        for i in range(dn_bboxes.shape[0]):
            lc, lb, lg = _layer_loss(dn_bboxes[i], dn_scores[i], gt_box_dn, gt_cls_dn, mask_dn, nc, rows=rows)
            total = total + lc + lb + lg
    return total, items
