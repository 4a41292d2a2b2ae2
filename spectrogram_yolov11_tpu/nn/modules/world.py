"""YOLO-World modules (flax.linen, NHWC): open-vocabulary detection blocks.

Re-implementations of the reference world-model stack
(/root/reference/ultralytics/nn/modules/block.py: MaxSigmoidAttnBlock:1346,
C2fAttn:1381, ImagePoolingAttn:1408, ContrastiveHead:1454,
BNContrastiveHead:1472; head.py:432 WorldDetect).

Text guidance flows through the graph as an extra (B, K, ct) tensor:
C2fAttn gates its last branch on it, ImagePoolingAttn refines it from image
features, WorldDetect scores regions against it (region-text similarity in
place of a fixed-class conv).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .block import Bottleneck
from .conv import Conv, batch_norm, conv2d

Dtype = Any


class MaxSigmoidAttnBlock(nn.Module):
    """Max-sigmoid text-guided spatial gating (reference: block.py:1346)."""

    c1: int
    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        B, H, W, _ = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, param_dtype=jnp.float32, dtype=self.dtype, name="gl")(guide)
        g = g.reshape(B, -1, self.nh, hc)  # (B, n, nh, hc)
        embed = Conv(self.c1, self.ec, 1, act=False, dtype=self.dtype, name="ec")(x, train) if self.c1 != self.ec else x
        embed = embed.reshape(B, H, W, self.nh, hc)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", embed.astype(jnp.float32), g.astype(jnp.float32))
        aw = aw.max(-1) / (hc**0.5)
        aw = aw + self.param("bias", nn.initializers.zeros, (self.nh,), jnp.float32)
        aw = jax.nn.sigmoid(aw)
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones, (1, self.nh, 1, 1), jnp.float32).reshape(1, 1, 1, self.nh)
        y = Conv(self.c1, self.c2, 3, 1, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(B, H, W, self.nh, hc) * aw[..., None].astype(y.dtype)
        return y.reshape(B, H, W, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention tail branch (reference: block.py:1381)."""

    c1: int
    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(self.c1, 2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck(c, c, self.shortcut, self.g, k=((3, 3), (3, 3)), e=1.0,
                                 dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, c, gc=self.gc, ec=self.ec, nh=self.nh,
                                      dtype=self.dtype, name="attn")(ys[-1], guide, train))
        return Conv((3 + self.n) * c, self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


def _adaptive_max_pool(x, k: int):
    """AdaptiveMaxPool2d((k, k)) on NHWC with torch window semantics."""
    B, H, W, C = x.shape
    rows = []
    for i in range(k):
        h0, h1 = (i * H) // k, -(-((i + 1) * H) // k)
        cols = []
        for j in range(k):
            w0, w1 = (j * W) // k, -(-((j + 1) * W) // k)
            cols.append(x[:, h0:h1, w0:w1].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, k, k, C)


class ImagePoolingAttn(nn.Module):
    """Refine text embeddings with pooled image features (reference: block.py:1408)."""

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        B = xs[0].shape[0]
        hc = self.ec // self.nh
        pooled = []
        for i, x in enumerate(xs):
            p = conv2d(x, self.ec, 1, bias=True, dtype=self.dtype, name=f"projections_{i}")
            pooled.append(_adaptive_max_pool(p, self.k).reshape(B, self.k * self.k, self.ec))
        feats = jnp.concatenate(pooled, axis=1)  # (B, nf*k*k, ec)

        q = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32, name="query_0")(text)
        q = nn.Dense(self.ec, param_dtype=jnp.float32, dtype=self.dtype, name="query_1")(q)
        kx = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32, name="key_0")(feats)
        kx = nn.Dense(self.ec, param_dtype=jnp.float32, dtype=self.dtype, name="key_1")(kx)
        vx = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32, name="value_0")(feats)
        vx = nn.Dense(self.ec, param_dtype=jnp.float32, dtype=self.dtype, name="value_1")(vx)

        q = q.reshape(B, -1, self.nh, hc)
        kx = kx.reshape(B, -1, self.nh, hc)
        vx = vx.reshape(B, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q.astype(jnp.float32), kx.astype(jnp.float32)) / (hc**0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, vx.astype(jnp.float32)).reshape(B, -1, self.ec)
        out = nn.Dense(self.ct, param_dtype=jnp.float32, dtype=self.dtype, name="proj")(out)
        s = self.param("scale", nn.initializers.zeros, (1,), jnp.float32) if self.scale else 1.0
        return out * s + text


class ContrastiveHead(nn.Module):
    """L2-normalized region-text similarity (reference: block.py:1454)."""

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,), jnp.float32)
        import math

        logit_scale = self.param("logit_scale", nn.initializers.constant(math.log(1 / 0.07)), (), jnp.float32)
        xn = x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).clip(1e-12)
        wn = w / jnp.linalg.norm(w.astype(jnp.float32), axis=-1, keepdims=True).clip(1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", xn, wn)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of the contrastive head (reference: block.py:1472)."""

    embed_dims: int

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,), jnp.float32)
        logit_scale = self.param("logit_scale", nn.initializers.constant(-1.0), (), jnp.float32)
        x = batch_norm(x, train, name="norm")
        wn = w / jnp.linalg.norm(w.astype(jnp.float32), axis=-1, keepdims=True).clip(1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x.astype(jnp.float32), wn)
        return sim * jnp.exp(logit_scale) + bias


class WorldDetect(nn.Module):
    """Detect head scoring regions against text embeddings (reference: head.py:432).

    Returns per-level (box (B, H, W, 4*reg_max), cls (B, H, W, K)) pairs where
    K = text.shape[1]; decode/NMS happen downstream exactly like Detect
    (see ops.decode.split_feats for why box/cls stay separate on TPU).
    """

    nc: int = 80
    embed: int = 512
    with_bn: bool = False
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, (x, cin) in enumerate(zip(xs, self.ch)):
            b = Conv(cin, c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = conv2d(b, 4 * self.reg_max, 1, bias=True, dtype=self.dtype, name=f"cv2_{i}_2")
            e = Conv(cin, c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            e = Conv(c3, c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(e, train)
            e = conv2d(e, self.embed, 1, bias=True, dtype=self.dtype, name=f"cv3_{i}_2")
            head = (BNContrastiveHead(self.embed, name=f"cv4_{i}") if self.with_bn
                    else ContrastiveHead(name=f"cv4_{i}"))
            c = head(e, text, train)
            outs.append((b, c.astype(b.dtype)))
        return outs
