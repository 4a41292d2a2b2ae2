"""Pallas TPU kernel for the NMS suppression stage (exact sequential greedy).

This kernel keeps the whole candidate set VMEM-resident (k <= 1024: boxes
16 KB, IoU matrix 4 MB — comfortably inside the ~16 MB VMEM budget) and runs
the exact sequential greedy scan in one fused kernel: one HBM read of the
boxes, one HBM write of the keep mask, no intermediate traffic. Grid: one
program per batch element.

MEASURED RESULT (TPU v5e, bs=8, k=512, full pipeline incl. top_k):
    XLA Jacobi formulation (ops/nms.py):  0.92 ms
    this Pallas sequential kernel:       31.3 ms
Both produce identical keep-sets. The k-iteration scf.for of (k,)-wide VPU
ops is loop-latency-bound, while the XLA Jacobi fixpoint converges in a few
(k, k)-wide sweeps the compiler schedules well — so ops/nms.py remains the
production path and this kernel is kept as the exact-sequential reference
(and as the Pallas on-ramp for a future sweep-style kernel). This is the
"don't hand-schedule what the compiler already does" lesson, measured.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, thres_ref, keep_ref, iou_scratch):
    """boxes (4, k) score-desc sorted (class-offset applied), valid (1, k)
    int32, thres (1, 1) SMEM -> keep (1, k) int32.

    Pallas-TPU constraints shape the formulation: the candidate axis k lives
    in the 128-lane dimension (Mosaic tiling), no dynamic indexing on VALUES
    (only on refs via pl.ds), and per-candidate scalars come from masked
    reductions over (k,)-wide VPU ops. Sequential greedy invariant:
    suppression only flows rank-forward, so the final keep set is simply
    valid & ~dead."""
    k = boxes_ref.shape[1]
    boxes = boxes_ref[:]  # (4, k) VMEM
    x1, y1 = boxes[0], boxes[1]
    x2, y2 = boxes[2], boxes[3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (k,)

    # pairwise IoU, computed once into VMEM scratch (k, k)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
    iou_scratch[:] = inter / (area[:, None] + area[None, :] - inter + 1e-7)

    thres = thres_ref[0, 0]
    valid = valid_ref[0, :]  # (k,) int32 0/1
    col = jax.lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(i, dead):  # dead: (k,) int32 0/1 (i1 vectors don't legalize in scf.for carries)
        sel = (col == i).astype(jnp.int32)
        alive_i = jnp.max(sel * valid * (1 - dead))  # scalar 0/1
        row = (iou_scratch[pl.ds(i, 1), :][0] > thres).astype(jnp.int32)  # dynamic REF read
        suppress = alive_i * row * (col > i).astype(jnp.int32)
        return jnp.maximum(dead, suppress)

    dead = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), jnp.int32))
    keep_ref[0, :] = valid * (1 - dead)


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def pallas_greedy_keep(
    boxes: jnp.ndarray,  # (b, k, 4) xyxy, score-desc sorted, class-offset applied
    valid: jnp.ndarray,  # (b, k) bool
    iou_thres: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact greedy NMS keep mask (b, k) — VMEM-fused Pallas kernel."""
    b, k, _ = boxes.shape
    thres = jnp.full((1, 1), iou_thres, jnp.float32)
    boxes_t = boxes.astype(jnp.float32).transpose(0, 2, 1)  # (b, 4, k): k in the lane dim

    def kernel(boxes_ref, valid_ref, thres_ref, keep_ref, iou_scratch):
        _nms_kernel(boxes_ref.at[0], valid_ref.at[0], thres_ref, keep_ref.at[0], iou_scratch)

    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (7 * k * k + 4 * k * k), bytes_accessed=b * (k * 4 * 4 + k * 4), transcendentals=0
        ),
    )(boxes_t, valid.astype(jnp.int32)[:, None, :], thres)
    return keep[:, 0, :] > 0


def non_max_suppression_pallas(
    preds: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    nc: int = 80,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    max_wh: float = 7680.0,
    interpret: bool = False,
):
    """Drop-in variant of ops.nms.non_max_suppression (single-label path)
    using the Pallas suppression kernel. Same outputs: ((b, max_det, 6), n)."""
    from .boxes import xywh2xyxy

    b, a, _ = preds.shape
    boxes_xywh = preds[..., :4]
    scores = preds[..., 4 : 4 + nc]
    best_cls = jnp.argmax(scores, axis=-1)
    best_score = jnp.max(scores, axis=-1)
    k = min(pre_nms_topk, a)
    top_scores, anchor = jax.lax.top_k(best_score, k)  # (b, k)
    cls = jnp.take_along_axis(best_cls, anchor, axis=1).astype(jnp.float32)
    valid = top_scores > conf_thres
    boxes = xywh2xyxy(jnp.take_along_axis(boxes_xywh, anchor[..., None], axis=1))
    off = (cls * max_wh)[..., None]
    keep = pallas_greedy_keep(boxes + off, valid, iou_thres, interpret=interpret)

    rank = jnp.where(keep, top_scores, -1.0)
    sel_scores, sel = jax.lax.top_k(rank, min(max_det, k))
    sel_valid = sel_scores > conf_thres
    out = jnp.concatenate(
        [
            jnp.take_along_axis(boxes, sel[..., None], axis=1),
            jnp.take_along_axis(top_scores, sel, axis=1)[..., None],
            jnp.take_along_axis(cls, sel, axis=1)[..., None],
        ],
        axis=-1,
    )
    out = jnp.where(sel_valid[..., None], out, 0.0)
    return out, jnp.sum(sel_valid.astype(jnp.int32), axis=1)
