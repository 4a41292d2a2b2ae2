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
from flax import linen as nn

from .block import Proto
from .conv import Conv, DWConv, conv2d

Dtype = Any


class Detect(nn.Module):
    """Decoupled anchor-free detect head over P3/P4/P5 (reference: head.py:21).

    Output per level i: (B, Hi, Wi, 4*reg_max + nc) raw logits; the first
    4*reg_max channels are DFL bin logits, the rest class logits.
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
            outs.append(jnp.concatenate((b, c), axis=-1))
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
        box_key = f"{prefix}cv2_{i}_2"
        cls_key = f"{prefix}cv3_{i}_2"
        if box_key in params:
            b = params[box_key]["bias"]
            params[box_key]["bias"] = jnp.ones_like(b)
        if cls_key in params:
            b = params[cls_key]["bias"]
            val = math.log(5 / nc / (640 / float(s)) ** 2)
            params[cls_key]["bias"] = jnp.full_like(b, 0.0).at[:nc].set(val)
    return params
