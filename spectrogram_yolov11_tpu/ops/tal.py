"""Task-Aligned assignment (TAL) — pure fixed-shape jnp.

Re-implementation of the reference TaskAlignedAssigner
(/root/reference/ultralytics/utils/tal.py:14-296) as a pure function over
padded GT tensors. The reference already works on fixed (b, max_gt, A)
tensors (with a CPU fallback for CUDA OOM, tal.py:73); here the whole
assignment stays on-device inside the jitted train step — masks instead of
boolean indexing, no host sync.

Constants (reference utils/loss.py:191): topk=10, alpha=0.5, beta=6.0, eps=1e-9.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .iou import bbox_iou, probiou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (b, A) int32
    target_bboxes: jnp.ndarray  # (b, A, 4)
    target_scores: jnp.ndarray  # (b, A, nc)
    fg_mask: jnp.ndarray  # (b, A) bool
    target_gt_idx: jnp.ndarray  # (b, A) int32


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Anchor centers strictly inside GT boxes (reference: tal.py:241).

    xy_centers (A, 2); gt_bboxes (b, max_gt, 4) xyxy -> (b, max_gt, A) bool.
    """
    lt = xy_centers[None, None, :, :] - gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:] - xy_centers[None, None, :, :]
    deltas = jnp.concatenate([lt, rb], axis=-1)
    return deltas.min(axis=-1) > eps


def select_topk_candidates(metrics: jnp.ndarray, topk: int, topk_mask: jnp.ndarray) -> jnp.ndarray:
    """Top-k anchors per GT by alignment metric (reference: tal.py:158).

    metrics (b, max_gt, A) -> (b, max_gt, A) bool.

    NOTE: with an explicit topk_mask (mask_gt rows) the reference applies NO
    per-anchor metric threshold — every top-k anchor of a real GT is a
    candidate, even metric-0 ones (they still pass the in-gts gate later and
    become fg with ~zero target score). Matching that exactly matters: it
    roughly triples the fg count early in training.
    """
    b, g, a = metrics.shape
    # k-step argmax membership instead of lax.top_k: the per-row O(A log A)
    # sort behind top_k was ~65% of the whole assigner on TPU (round-3
    # bisect: 0.268 -> 0.034 ms/img at (128,32,8400)); k max-reductions
    # stream the row k times on the VPU instead. Only the membership mask is
    # needed, never the sorted values. jnp.argmax resolves ties to the
    # lowest index, identical to lax.top_k's stable order.
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, g, a), 2)
    mm = metrics
    hits = jnp.zeros((b, g, a), bool)
    for _ in range(topk):
        h = iota == jnp.argmax(mm, axis=-1)[..., None]
        hits = hits | h
        mm = jnp.where(h, -jnp.inf, mm)
    return hits & topk_mask[..., None].astype(bool)


def select_highest_overlaps(mask_pos: jnp.ndarray, overlaps: jnp.ndarray, n_max_boxes: int):
    """Resolve anchors claimed by multiple GTs -> the GT with highest IoU
    (reference: tal.py:265). Returns (target_gt_idx (b,A), fg_mask (b,A), mask_pos)."""
    fg_count = mask_pos.sum(axis=-2)  # (b, A)
    multi = fg_count > 1
    best_gt = jnp.argmax(overlaps, axis=-2)  # (b, A)
    onehot_best = jax.nn.one_hot(best_gt, n_max_boxes, dtype=mask_pos.dtype, axis=-2) > 0  # (b, g, A)
    mask_pos = jnp.where(multi[:, None, :], onehot_best & (fg_count[:, None, :] > 0), mask_pos)
    fg_mask = mask_pos.sum(axis=-2) > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # (b, A)
    return target_gt_idx, fg_mask, mask_pos


@functools.partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "rotated"))
def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (b, A, nc) sigmoid scores (stop-gradient upstream)
    pd_bboxes: jnp.ndarray,  # (b, A, 4) xyxy pixels (or (b, A, 5) rboxes)
    anc_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,  # (b, max_gt, 1) int
    gt_bboxes: jnp.ndarray,  # (b, max_gt, 4) xyxy pixels (or 5 for rotated)
    mask_gt: jnp.ndarray,  # (b, max_gt, 1) bool/float: real (non-pad) GT rows
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    rotated: bool = False,
    eps: float = 1e-9,
) -> AssignResult:
    """The assignment: align = score^alpha * CIoU^beta, per-GT top-10 anchors
    inside the GT, conflicts to highest IoU, scores normalized by
    align_metric * pos_overlap / pos_align_metric (reference tal.py:40-156)."""
    b, a, nc = pd_scores.shape
    n_max = gt_bboxes.shape[1]
    mask_gt_b = mask_gt.astype(bool)[..., 0]  # (b, max_gt)

    if rotated:
        from .decode import dist2bbox  # noqa: F401 (rboxes arrive pre-decoded)

        in_gts = _select_candidates_in_rotated_gts(anc_points, gt_bboxes)
        overlaps_fn = lambda g, p: jnp.clip(probiou(g, p), 0, None)
    else:
        in_gts = select_candidates_in_gts(anc_points, gt_bboxes, eps)
        overlaps_fn = lambda g, p: jnp.clip(bbox_iou(g, p, xywh=False, CIoU=True), 0, None)

    # scores gathered at each GT's class: (b, max_gt, A). One-hot einsum
    # (an MXU matmul) instead of a broadcast gather — element gathers with
    # (b, max_gt, A) index fan-out lower poorly on TPU (round-3 loss profile).
    gt_cls = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, nc - 1)
    cls_onehot = jax.nn.one_hot(gt_cls, nc, dtype=pd_scores.dtype)  # (b, max_gt, nc)
    scores_at_gt = jnp.einsum("ban,bgn->bga", pd_scores, cls_onehot)

    mask_valid = in_gts & mask_gt_b[..., None]
    overlaps = jnp.where(
        mask_valid,
        overlaps_fn(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]),
        0.0,
    )
    align_metric = jnp.where(mask_valid, scores_at_gt**alpha * overlaps**beta, 0.0)

    mask_topk = select_topk_candidates(align_metric, topk, mask_gt_b)
    mask_pos = mask_topk & mask_valid

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, n_max)

    # targets — one-hot matmul instead of take_along_axis: a (b*A)-row
    # gather costs ~20-40 ns/row on TPU (round-4 gather roofline) = ~15 ms
    # per bs128 step here (round-5 xplane profile: the two biggest loss-side
    # fusions were exactly these index expansions); the one-hot einsum is
    # 0.27 GFLOP on the MXU and streams dense
    idx_onehot = jax.nn.one_hot(target_gt_idx, n_max, dtype=jnp.float32)  # (b, A, max_gt)
    tl = jnp.einsum("bag,bg->ba", idx_onehot, gt_cls.astype(jnp.float32)).astype(gt_cls.dtype)
    tb = jnp.einsum("bag,bgc->bac", idx_onehot, gt_bboxes.astype(jnp.float32)).astype(gt_bboxes.dtype)
    target_labels = jnp.where(fg_mask, tl, 0)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype) * fg_mask[..., None]

    # normalization (reference tal.py:111-116)
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)  # (b, max_gt, 1)
    pos_overlap = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(axis=-2)  # (b, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels.astype(jnp.int32), tb, target_scores, fg_mask, target_gt_idx.astype(jnp.int32))


def _select_candidates_in_rotated_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Point-in-rotated-box test (reference: RotatedTaskAlignedAssigner.select_candidates_in_gts).

    gt_bboxes (b, max_gt, 5) as (cx, cy, w, h, angle) -> corners -> cross-product test.
    """
    corners = rbox2corners(gt_bboxes)  # (b, max_gt, 4, 2)
    a_c, b_c, _, d_c = corners[..., 0, :], corners[..., 1, :], corners[..., 2, :], corners[..., 3, :]
    ab = b_c - a_c
    ad = d_c - a_c
    ap = xy_centers[None, None, :, :] - a_c[:, :, None, :]  # (b, g, A, 2)
    norm_ab = (ab * ab).sum(-1)[..., None]
    norm_ad = (ad * ad).sum(-1)[..., None]
    ap_dot_ab = (ap * ab[:, :, None, :]).sum(-1)
    ap_dot_ad = (ap * ad[:, :, None, :]).sum(-1)
    return (ap_dot_ab >= 0) & (ap_dot_ab <= norm_ab) & (ap_dot_ad >= 0) & (ap_dot_ad <= norm_ad)


def rbox2corners(rbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) cx cy w h angle -> (..., 4, 2) corner points (reference: ops.py xywhr2xyxyxyxy)."""
    ctr = rbox[..., :2]
    w, h, angle = rbox[..., 2:3], rbox[..., 3:4], rbox[..., 4:5]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], axis=-1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], axis=-1)
    pt1 = ctr + vec1 + vec2
    pt2 = ctr + vec1 - vec2
    pt3 = ctr - vec1 - vec2
    pt4 = ctr - vec1 + vec2
    return jnp.stack([pt1, pt2, pt3, pt4], axis=-2)
