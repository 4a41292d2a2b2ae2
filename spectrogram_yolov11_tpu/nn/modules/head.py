"""Task heads (flax.linen, NHWC).

Re-implementations of the reference heads (/root/reference/ultralytics/nn/
modules/head.py: Detect:21, Segment:300, OBB:325, Pose:355, Classify:407).

Design deviation from the reference (TPU-first): heads return RAW per-level
feature maps only — DFL decode, anchor generation and NMS live in
`spectrogram_yolov11_tpu.ops.decode` as a separately-jitted fused postprocess.
This keeps the network graph pure/static-shaped, and lets XLA fuse
decode+NMS into one device program instead of splitting at a host boundary.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .block import Proto
from .conv import Conv, DWConv, conv2d

Dtype = Any


class Detect(nn.Module):
    """Decoupled anchor-free detect head over P3/P4/P5 (reference: head.py:21).

    Output per level i: a pair (box (B, Hi, Wi, 4*reg_max), cls (B, Hi, Wi, nc))
    of raw logits. The reference packs both into one 4*reg_max+nc channel map
    (head.py:93); keeping them separate avoids a lane-padded concat that
    downstream decode/loss would immediately re-split (ops.decode.split_feats).
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    legacy: bool = False  # v3/v5/v8/v9-style cls branch
    reg_max: int = 16
    end2end: bool = False
    dtype: Optional[Dtype] = None

    @property
    def nl(self) -> int:
        return len(self.ch)

    @property
    def no(self) -> int:
        return self.nc + self.reg_max * 4

    def _branches(self, xs, train, box_prefix="cv2", cls_prefix="cv3"):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, (x, cin) in enumerate(zip(xs, self.ch)):
            b = Conv(cin, c2, 3, dtype=self.dtype, name=f"{box_prefix}_{i}_0")(x, train)
            b = Conv(c2, c2, 3, dtype=self.dtype, name=f"{box_prefix}_{i}_1")(b, train)
            b = conv2d(b, 4 * self.reg_max, 1, bias=True, dtype=self.dtype, name=f"{box_prefix}_{i}_2")
            if self.legacy:
                c = Conv(cin, c3, 3, dtype=self.dtype, name=f"{cls_prefix}_{i}_0")(x, train)
                c = Conv(c3, c3, 3, dtype=self.dtype, name=f"{cls_prefix}_{i}_1")(c, train)
                c = conv2d(c, self.nc, 1, bias=True, dtype=self.dtype, name=f"{cls_prefix}_{i}_2")
            else:
                c = DWConv(cin, cin, 3, dtype=self.dtype, name=f"{cls_prefix}_{i}_0_0")(x, train)
                c = Conv(cin, c3, 1, dtype=self.dtype, name=f"{cls_prefix}_{i}_0_1")(c, train)
                c = DWConv(c3, c3, 3, dtype=self.dtype, name=f"{cls_prefix}_{i}_1_0")(c, train)
                c = Conv(c3, c3, 1, dtype=self.dtype, name=f"{cls_prefix}_{i}_1_1")(c, train)
                c = conv2d(c, self.nc, 1, bias=True, dtype=self.dtype, name=f"{cls_prefix}_{i}_2")
            # box/cls stay separate per level — see ops.decode.split_feats for
            # why the reference's packed cat (head.py:93) is avoided on TPU
            outs.append((b, c))
        return outs

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if self.end2end:
            one2many = self._branches(xs, train, "cv2", "cv3")
            xs_det = [jax.lax.stop_gradient(x) for x in xs]
            one2one = self._branches(xs_det, train, "one2one_cv2", "one2one_cv3")
            return {"one2many": one2many, "one2one": one2one}
        return self._branches(xs, train)


class Segment(nn.Module):
    """Detect + mask-coefficient branch + Proto (reference: head.py:300).

    Returns (detect_feats, mask_coeffs (B, A, nm), protos (B, H/4, W/4, nm)).
    """

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    legacy: bool = False
    reg_max: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        p = Proto(self.ch[0], self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        mcs = []
        for i, (x, cin) in enumerate(zip(xs, self.ch)):
            m = Conv(cin, c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = Conv(c4, c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = conv2d(m, self.nm, 1, bias=True, dtype=self.dtype, name=f"cv4_{i}_2")
            mcs.append(m.reshape(m.shape[0], -1, self.nm))
        feats = Detect(self.nc, self.ch, self.legacy, self.reg_max, dtype=self.dtype, name="detect")(xs, train)
        return feats, jnp.concatenate(mcs, axis=1), p


class Pose(nn.Module):
    """Detect + keypoint branch (reference: head.py:355).

    Returns (detect_feats, kpt_raw (B, A, nk)) with nk = kpt_shape[0]*kpt_shape[1].
    """

    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    legacy: bool = False
    reg_max: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        ks = []
        for i, (x, cin) in enumerate(zip(xs, self.ch)):
            k = Conv(cin, c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            k = conv2d(k, nk, 1, bias=True, dtype=self.dtype, name=f"cv4_{i}_2")
            ks.append(k.reshape(k.shape[0], -1, nk))
        feats = Detect(self.nc, self.ch, self.legacy, self.reg_max, dtype=self.dtype, name="detect")(xs, train)
        return feats, jnp.concatenate(ks, axis=1)


class OBB(nn.Module):
    """Detect + rotation-angle branch (reference: head.py:325).

    Returns (detect_feats, angle_raw (B, A, ne)); angle decode
    (sigmoid - 0.25) * pi happens in ops.decode.
    """

    nc: int = 80
    ne: int = 1
    ch: Tuple[int, ...] = ()
    legacy: bool = False
    reg_max: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c4 = max(self.ch[0] // 4, self.ne)
        angs = []
        for i, (x, cin) in enumerate(zip(xs, self.ch)):
            a = Conv(cin, c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            a = Conv(c4, c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(a, train)
            a = conv2d(a, self.ne, 1, bias=True, dtype=self.dtype, name=f"cv4_{i}_2")
            angs.append(a.reshape(a.shape[0], -1, self.ne))
        feats = Detect(self.nc, self.ch, self.legacy, self.reg_max, dtype=self.dtype, name="detect")(xs, train)
        return feats, jnp.concatenate(angs, axis=1)


class Classify(nn.Module):
    """Classification head: conv -> GAP -> dropout -> linear (reference: head.py:407).

    Returns logits (B, nc); softmax applied by the predictor, CE loss by trainer.
    """

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        c_ = 1280
        x = Conv(self.c1, c_, self.k, self.s, self.p, self.g, dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # GAP
        return nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32, name="linear")(x)


def detect_bias_init(params: dict, strides, nc: int, prefix: str = "") -> dict:
    """Apply the reference Detect.bias_init (head.py:133) to an initialized
    param tree: box-branch final bias = 1.0, cls-branch final bias =
    log(5 / nc / (640/stride)^2). Operates on the flax param dict in place
    (returns the same object). `params` is the Detect module's own subtree.
    """
    for i, s in enumerate(strides):
        # end2end heads carry a duplicated one2one branch (reference head.py:141)
        for branch in ("", "one2one_"):
            box_key = f"{prefix}{branch}cv2_{i}_2"
            cls_key = f"{prefix}{branch}cv3_{i}_2"
            if box_key in params:
                b = params[box_key]["bias"]
                params[box_key]["bias"] = jnp.ones_like(b)
            if cls_key in params:
                b = params[cls_key]["bias"]
                val = math.log(5 / nc / (640 / float(s)) ** 2)
                params[cls_key]["bias"] = jnp.full_like(b, 0.0).at[:nc].set(val)
    return params


class _DecoderStack(nn.Module):
    """Container giving decoder layers the torch scope `decoder.layers_{i}`
    (reference: DeformableTransformerDecoder, transformer.py:374). Compact
    modules may be invoked repeatedly; each distinct name creates one layer."""

    d_model: int
    n_heads: int
    d_ffn: int
    n_levels: int
    n_points: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, i: int, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None):
        from .transformer import DeformableTransformerDecoderLayer

        return DeformableTransformerDecoderLayer(
            self.d_model, self.n_heads, self.d_ffn, self.n_levels, self.n_points,
            dtype=self.dtype, name=f"layers_{i}",
        )(embed, refer_bbox, feats, shapes, attn_mask=attn_mask, query_pos=query_pos)


class RTDETRDecoder(nn.Module):
    """Real-Time Deformable Transformer Decoder head (reference: head.py:486).

    NHWC multi-scale inputs -> 300-query deformable decoder with IoU-aware
    query selection and (in training) contrastive denoising queries.

    TPU-first deviations from the reference:
    - denoising group geometry is STATIC: callers pass pre-noised dn_cls /
      dn_bbox / dn_valid tensors of fixed width (generated inside the jitted
      train step by ops.detr_loss.make_cdn_batch), instead of the reference's
      dynamic get_cdn_group whose width depends on the batch's max GT count;
    - training returns stacked per-layer predictions (ndl, B, Lq, ...) so the
      aux losses consume one fused tensor.
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    eval_idx: int = -1
    learnt_init_query: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False, dn_cls=None, dn_bbox=None, dn_valid=None, attn_mask=None):
        from .transformer import MLP, bias_init_with_prob, inverse_sigmoid

        nl = len(self.ch)
        B = xs[0].shape[0]
        bias_cls = bias_init_with_prob(0.01) / 80 * self.nc

        # -- input projection + flatten (reference _get_encoder_input) --
        feats_l, shapes = [], []
        for i, x in enumerate(xs):
            p = conv2d(x, self.hd, 1, bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(), name=f"input_proj_{i}_0")
            p = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32 if train else p.dtype,
                             param_dtype=jnp.float32, name=f"input_proj_{i}_1")(p)
            h, w = p.shape[1], p.shape[2]
            feats_l.append(p.reshape(B, h * w, self.hd))
            shapes.append((h, w))
        feats = jnp.concatenate(feats_l, axis=1)  # (B, A, hd)

        # -- anchors (reference _generate_anchors: grid centers + 0.05*2^i wh) --
        anchors_np, valid_np = [], []
        for i, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
            xy = (np.stack([gx, gy], -1) + 0.5) / np.array([w, h], np.float32)
            wh = np.full_like(xy, 0.05 * (2.0**i))
            anchors_np.append(np.concatenate([xy, wh], -1).reshape(h * w, 4))
        anchors_np = np.concatenate(anchors_np, 0)  # (A, 4)
        valid_np = ((anchors_np > 1e-2) & (anchors_np < 1 - 1e-2)).all(-1, keepdims=True)  # (A, 1)
        logit_anchors = np.where(valid_np, np.log(anchors_np / (1 - anchors_np + 1e-12)), np.inf).astype(np.float32)
        anchors = jnp.asarray(logit_anchors)[None]  # (1, A, 4)
        valid = jnp.asarray(valid_np.astype(np.float32))[None]  # (1, A, 1)

        # -- encoder head + query selection (reference _get_decoder_input) --
        features = nn.Dense(self.hd, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=nn.initializers.xavier_uniform(), name="enc_output_0")(valid * feats)
        features = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, param_dtype=jnp.float32, name="enc_output_1")(features)
        enc_scores_all = nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32,
                                  bias_init=nn.initializers.constant(bias_cls), name="enc_score_head")(features)
        nq = min(self.nq, features.shape[1])  # tiny inputs may have < nq anchors
        _, topi = jax.lax.top_k(enc_scores_all.max(-1), nq)  # (B, nq)
        top_feats = jnp.take_along_axis(features, topi[..., None], axis=1)  # (B, nq, hd)
        top_anchors = jnp.take_along_axis(jnp.broadcast_to(anchors, (B, anchors.shape[1], 4)), topi[..., None], axis=1)
        enc_bbox_head = MLP(self.hd, self.hd, 4, 3, last_zero=True, dtype=self.dtype, name="enc_bbox_head")
        refer_bbox = enc_bbox_head(top_feats) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_bbox)
        enc_scores = jnp.take_along_axis(enc_scores_all, topi[..., None], axis=1)  # (B, nq, nc)

        embeddings = top_feats  # learnt_init_query=False in all shipped configs
        if train:
            refer_bbox = jax.lax.stop_gradient(refer_bbox)
            embeddings = jax.lax.stop_gradient(embeddings)

        # -- denoising queries (training) --
        # the embedding table is declared unconditionally so the param tree
        # does not depend on whether this trace carries dn queries
        embed_table = self.param("denoising_class_embed", nn.initializers.normal(1.0),
                                 (self.nc, self.hd), jnp.float32)
        num_dn = 0
        if dn_cls is not None:
            num_dn = dn_cls.shape[1]
            dn_embed = jnp.take(embed_table, dn_cls, axis=0) * dn_valid[..., None].astype(jnp.float32)
            dn_bbox = dn_bbox * dn_valid[..., None].astype(dn_bbox.dtype)
            embeddings = jnp.concatenate([dn_embed.astype(embeddings.dtype), embeddings], axis=1)
            refer_bbox = jnp.concatenate([dn_bbox.astype(refer_bbox.dtype), refer_bbox], axis=1)

        # -- decoder (reference DeformableTransformerDecoder.forward) --
        query_pos_head = MLP(4, 2 * self.hd, self.hd, 2, xavier=True, dtype=self.dtype, name="query_pos_head")
        stack = _DecoderStack(self.hd, self.nh, self.d_ffn, nl, self.ndp, dtype=self.dtype, name="decoder")
        dec_bbox_heads = [MLP(self.hd, self.hd, 4, 3, last_zero=True, dtype=self.dtype, name=f"dec_bbox_head_{i}")
                          for i in range(self.ndl)]
        dec_score_heads = [nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32,
                                    bias_init=nn.initializers.constant(bias_cls), name=f"dec_score_head_{i}")
                           for i in range(self.ndl)]
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx

        output = embeddings
        refer = jax.nn.sigmoid(refer_bbox)
        dec_bboxes, dec_cls = [], []
        last_refined = None
        for i in range(self.ndl):
            output = stack(i, output, refer, feats, shapes, attn_mask=attn_mask, query_pos=query_pos_head(refer))
            bbox = dec_bbox_heads[i](output)
            score = dec_score_heads[i](output)  # computed every layer so init creates all params
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer))
            if train:
                dec_cls.append(score)
                dec_bboxes.append(refined if i == 0 else jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined)))
            elif i == eval_idx:
                dec_cls.append(score)
                dec_bboxes.append(refined)
                break
            last_refined = refined
            refer = jax.lax.stop_gradient(refined) if train else refined

        dec_bboxes = jnp.stack(dec_bboxes)  # (ndl|1, B, Lq, 4)
        dec_cls = jnp.stack(dec_cls)
        if train:
            return {
                "dec_bboxes": dec_bboxes, "dec_scores": dec_cls,
                "enc_bboxes": enc_bboxes, "enc_scores": enc_scores,
                "num_dn": num_dn,
            }
        # (B, nq, 4 + nc) — normalized xywh + class probabilities
        return jnp.concatenate([dec_bboxes[-1], jax.nn.sigmoid(dec_cls[-1])], axis=-1)
