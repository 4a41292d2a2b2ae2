"""Fork-authored module zoo (flax.linen, NHWC).

Re-implementations of the spectrogram fork's ~40 active custom modules
(/root/reference/ultralytics/nn/modules/conv.py and block.py — the set
imported by nn/tasks.py:14-98 and registered in parse_model). These power the
144 fork model YAMLs: frequency-axis attention (HCoordAtt:1637 "main" block),
coordinate attention, deformable LDConv, ghost/max conv hybrids, learned
feature fusion (Fusion:1854 with mode 'ESChannel' hardcoded by parse_model),
BiFPN weighted concats, gated channel transforms, and FFT-domain channel
attention (BottleNect:2352 + FGM:2409 — jnp.fft on TPU).

Attribute names mirror the torch originals for mechanical weight translation.
Known deviations (documented inline): Dropout/DropPath are identity (they are
regularizers off at inference; training determinism preferred here).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .conv import Conv, autopad, avg_pool2d, batch_norm, conv2d, max_pool2d, torch_kernel_init
from .block import Bottleneck, C3, _c2f_forward

Dtype = Any


def h_sigmoid(x):
    return jax.nn.relu6(x + 3) / 6


def h_swish(x):
    return x * h_sigmoid(x)


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    """Channel shuffle, NHWC (reference: conv.py:2270 channel_shuffle)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w, groups, c // groups).swapaxes(-1, -2).reshape(b, h, w, c)


class SELayer(nn.Module):
    """Squeeze-excite (reference: block.py:201)."""

    channel: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        y = x.mean(axis=(1, 2))  # (b, c)
        y = nn.Dense(self.channel // self.reduction, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc_0")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channel, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc_2")(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class SaELayer(nn.Module):
    """Split-excite with 4 cardinal branches (reference: block.py:218)."""

    in_channel: int
    reduction: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channel
        r = c // self.reduction
        y = x.mean(axis=(1, 2))
        outs = []
        for i in range(1, 5):
            h = nn.Dense(r, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=f"fc{i}_0")(y)
            outs.append(jax.nn.relu(h))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc_0")(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class GCT(nn.Module):
    """Gated channel transform, l2 mode (reference: conv.py:2284)."""

    num_channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.num_channels
        alpha = self.param("alpha", lambda k: jnp.ones((1, 1, 1, c), jnp.float32))
        gamma = self.param("gamma", lambda k: jnp.zeros((1, 1, 1, c), jnp.float32))
        beta = self.param("beta", lambda k: jnp.zeros((1, 1, 1, c), jnp.float32))
        xf = x.astype(jnp.float32)
        embedding = jnp.sqrt((xf**2).sum(axis=(1, 2), keepdims=True) + self.epsilon) * alpha
        norm = gamma / jnp.sqrt((embedding**2).mean(axis=-1, keepdims=True) + self.epsilon)
        gate = 1.0 + jnp.tanh(embedding * norm + beta)
        return (xf * gate).astype(x.dtype)


class WeightedSpatialAttention(nn.Module):
    """mean+max spatial gate (reference: conv.py:1839)."""

    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        gate = conv2d(stat, 1, self.kernel_size, 1, self.kernel_size // 2, bias=False, dtype=self.dtype, name="cv1")
        return x * jax.nn.sigmoid(gate)


class SobelConv(nn.Module):
    """Fixed-Sobel-initialized (trainable) directional convs (reference: conv.py:1154)."""

    in_channels: int = 1
    out_channels: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        sobel_x = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
        sobel_y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
        kernels = [sobel_x, sobel_x + sobel_y, sobel_y]  # 0deg, ~45deg, 90deg
        out = 0
        for i, k0 in enumerate(kernels):
            # grouped conv (groups=out_channels), kernel (3,3,in/groups=1,out)
            init = np.repeat(k0[:, :, None, None], self.out_channels, axis=3)
            w = self.param(f"convs_{i}", lambda key, init=init: jnp.asarray(init))
            out = out + jax.lax.conv_general_dilated(
                x.astype(jnp.float32), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=self.out_channels,
            )
        return out.astype(x.dtype)


class SobelSpatialAttention(nn.Module):
    """Sobel-filtered spatial gate (reference: conv.py:1184)."""

    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        s = SobelConv(2, 2, dtype=self.dtype, name="sobel")(stat, train)
        gate = conv2d(s, 1, 1, 1, 0, bias=False, dtype=self.dtype, name="cv1")
        return x * jax.nn.sigmoid(gate)


class MSCSpatialAttention(nn.Module):
    """Multi-scale (31x31 + 3x3) spatial attention with channel reweighting
    (reference: conv.py:1200)."""

    c1: int
    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        x2 = jax.nn.relu(conv2d(stat, 1, 31, 1, 15, bias=False, dtype=self.dtype, name="cv1_0"))
        x3 = jax.nn.relu(conv2d(stat, 1, 3, 1, 1, bias=False, dtype=self.dtype, name="cv2_0"))
        x4 = x * x2
        x5 = x * x3
        x6 = x4 + x5
        x7 = x6.mean(axis=(1, 2), keepdims=True)
        g = jax.nn.relu(conv2d(x7, self.c1, 1, 1, 0, bias=True, dtype=self.dtype, name="fc"))
        return x4 * g + x5 * g + x


class ECAAttention(nn.Module):
    """Efficient channel attention via 1d conv over pooled channels
    (reference: conv.py:1420; note the fork uses ReLU, not sigmoid)."""

    c1: int
    k_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.mean(axis=(1, 2))  # (b, c)
        # conv1d over the channel axis
        w = self.param("conv", torch_kernel_init(), (self.k_size, 1, 1))
        y = jax.lax.conv_general_dilated(
            y[:, :, None], w, (1,), [(self.k_size // 2, self.k_size // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[..., 0]
        return jax.nn.relu(y)[:, None, None, :]


class CoordAtt(nn.Module):
    """Coordinate attention (reference: conv.py:1477)."""

    inp: int
    oup: int
    reduction: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, self.inp // self.reduction)
        x_h = x.mean(axis=2)  # (b, h, c): pooled over W
        x_w = x.mean(axis=1)  # (b, w, c): pooled over H
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (b, h+w, 1, c)
        y = conv2d(y, mip, 1, 1, 0, bias=True, dtype=self.dtype, name="conv1")
        y = batch_norm(y, train, name="bn1")
        y = h_swish(y)
        y_h, y_w = y[:, :h], y[:, h:]
        a_h = jax.nn.sigmoid(conv2d(y_h, self.oup, 1, 1, 0, bias=True, dtype=self.dtype, name="conv_h"))  # (b,h,1,c)
        a_w = jax.nn.sigmoid(conv2d(y_w, self.oup, 1, 1, 0, bias=True, dtype=self.dtype, name="conv_w"))  # (b,w,1,c)
        return x * a_w.transpose(0, 2, 1, 3) * a_h


class HCoordAtt(nn.Module):
    """The fork's 'main' block (reference: conv.py:1637): spatial mean+max ->
    3x3 conv -> sigmoid -> average along H -> per-column (frequency-axis) gate.
    On spectrograms the W axis is time; this learns a frequency-band gate."""

    inp: int
    oup: int
    reduction: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        pooled = jax.nn.sigmoid(conv2d(stat, 1, 3, 1, 1, bias=False, dtype=self.dtype, name="cv1"))
        x_w = pooled.mean(axis=1, keepdims=True)  # AdaptiveAvgPool2d((1, None)): average over H
        return x * x_w


class MaxHCoordAtt(nn.Module):
    """Max-pooled coordinate gate (reference: conv.py:1778)."""

    inp: int
    oup: int
    reduction: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mip = max(8, self.inp // self.reduction)
        x_m = x.max(axis=1, keepdims=True)  # (b, 1, w, c)
        x_m = conv2d(x_m, mip, 1, 1, 0, bias=True, dtype=self.dtype, name="conv1")
        x_m = batch_norm(x_m, train, name="bn1")
        x_m = h_swish(x_m)
        a_m = jax.nn.sigmoid(conv2d(x_m, self.oup, 1, 1, 0, bias=True, dtype=self.dtype, name="conv_m"))
        return x * a_m


class GlobalStdPool2d(nn.Module):
    """Std over H keeping W (reference: conv.py:1674)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = x.mean(axis=1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=1, keepdims=True)
        return jnp.sqrt(var + 1e-5)


# ---------------------------------------------------------------------------
# LDConv (AKConv-style deformable sampling, reference: conv.py:208)
# ---------------------------------------------------------------------------


class LDConv(nn.Module):
    """Learnable deformable conv with num_param sampling points.

    Offsets come from a 3x3 conv (zero-init); features are bilinearly sampled
    at (initial grid shape + offsets), stacked along H, and reduced by a
    (num_param, 1)-strided conv + sigmoid. Gather-based; XLA lowers the
    dynamic gathers to efficient TPU ops since all shapes are static.
    """

    inc: int
    outc: int
    num_param: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    def _p_n(self) -> np.ndarray:
        n = self.num_param
        base = round(math.sqrt(n))
        rows, mod = n // base, n % base
        gx, gy = np.meshgrid(np.arange(rows), np.arange(base), indexing="ij")
        px, py = gx.reshape(-1), gy.reshape(-1)
        if mod > 0:
            mx, my = np.meshgrid(np.arange(rows, rows + 1), np.arange(mod), indexing="ij")
            px = np.concatenate([px, mx.reshape(-1)])
            py = np.concatenate([py, my.reshape(-1)])
        return np.concatenate([px, py]).astype(np.float32)  # (2N,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.num_param
        b, h, w, c = x.shape
        offset = nn.Conv(
            2 * n, (3, 3), strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)], use_bias=True,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, param_dtype=jnp.float32, name="p_conv",
        )(x)  # (b, h', w', 2N); zero-init like the reference
        hp, wp = offset.shape[1], offset.shape[2]
        p_n = jnp.asarray(self._p_n())  # (2N,)
        gy0, gx0 = jnp.meshgrid(jnp.arange(hp) * self.stride, jnp.arange(wp) * self.stride, indexing="ij")
        p0 = jnp.concatenate([jnp.repeat(gy0[..., None], n, -1), jnp.repeat(gx0[..., None], n, -1)], -1)  # (h',w',2N)
        p = p0[None] + p_n[None, None, None, :] + offset.astype(jnp.float32)  # (b,h',w',2N)
        pr = jnp.clip(p[..., :n], 0, h - 1)
        pc = jnp.clip(p[..., n:], 0, w - 1)
        r0 = jnp.clip(jnp.floor(pr), 0, h - 1)
        c0 = jnp.clip(jnp.floor(pc), 0, w - 1)
        r1 = jnp.clip(r0 + 1, 0, h - 1)
        c1 = jnp.clip(c0 + 1, 0, w - 1)

        def gather(rows, cols):
            idx = (rows * w + cols).astype(jnp.int32).reshape(b, -1)  # (b, h'*w'*N)
            flat = x.reshape(b, h * w, c)
            return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(b, hp, wp, n, c)

        g_lt = (1 + (r0 - pr)) * (1 + (c0 - pc))
        g_rb = (1 - (r1 - pr)) * (1 - (c1 - pc))
        g_lb = (1 + (r0 - pr)) * (1 - (c1 - pc))
        g_rt = (1 - (r1 - pr)) * (1 + (c0 - pc))
        xo = (
            g_lt[..., None] * gather(r0, c0)
            + g_rb[..., None] * gather(r1, c1)
            + g_lb[..., None] * gather(r0, c1)
            + g_rt[..., None] * gather(r1, c0)
        ).astype(x.dtype)  # (b, h', w', N, c)
        # stack sampling points along H: (b, h'*N, w', c)
        xo = xo.transpose(0, 1, 3, 2, 4).reshape(b, hp * n, wp, c)
        y = nn.Conv(self.outc, (n, 1), strides=(n, 1), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_0")(xo)
        return jax.nn.sigmoid(y)


class AKSpatialAttention(nn.Module):
    """LDConv spatial gate (reference: conv.py:1257)."""

    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        return x * LDConv(2, 1, 7, 1, dtype=self.dtype, name="cv1")(stat, train)


class SAKAM(nn.Module):
    """Dual-scale LDConv spatial attention with a shared global channel gate
    and identity residual (reference: conv.py:1307-1370 — x4/x5 spatial
    branches, pool->fc->ReLU gate applied to both, `x10 + x11 + x`). The
    reference also declares a `channel_attention = ECAAttention(c1)` it never
    calls — dead params, dropped on ingest by utils/torch_compat.py."""

    c1: int
    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        a = LDConv(2, 1, 7, 1, dtype=self.dtype, name="cv1")(stat, train)
        b = LDConv(2, 1, 15, 1, dtype=self.dtype, name="cv2")(stat, train)
        x4, x5 = x * a, x * b
        pooled = (x4 + x5).mean(axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        g = nn.relu(nn.Conv(self.c1, (1, 1), use_bias=True, dtype=self.dtype, name="fc")(pooled))
        return x4 * g + x5 * g + x


class AKCBAM(nn.Module):
    """CBAM variant with SAKAM spatial attention (reference: conv.py:1441)."""

    c1: int
    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SAKAM(self.c1, 7, dtype=self.dtype, name="spatial_attention")(x, train)


class Cross_AKConv(nn.Module):
    """LDConv bottleneck (reference: block.py:878)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Any = (3, 3)
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = LDConv(self.c1, c_, 5, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c_, self.c2, 3, 1, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


# ---------------------------------------------------------------------------
# FFT-domain channel attention (reference: block.py:782 BottleNect, :838 FGM)
# ---------------------------------------------------------------------------


class FGM(nn.Module):
    """Frequency-gated modulation: elementwise product with the FFT of a
    parallel branch, back via iFFT magnitude (reference: block.py:838)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        x1 = conv2d(x, d, 1, 1, 0, bias=True, dtype=self.dtype, name="dwconv1")
        x2 = conv2d(x, d, 1, 1, 0, bias=True, dtype=self.dtype, name="dwconv2")
        alpha = self.param("alpha", lambda k: jnp.zeros((1, 1, 1, d), jnp.float32))
        beta = self.param("beta", lambda k: jnp.ones((1, 1, 1, d), jnp.float32))
        x2_fft = jnp.fft.fft2(x2.astype(jnp.float32), axes=(1, 2))
        out = jnp.abs(jnp.fft.ifft2(x1.astype(jnp.float32) * x2_fft, axes=(1, 2)))
        return (out * alpha + x.astype(jnp.float32) * beta).astype(x.dtype)


class BottleNect(nn.Module):
    """FFT channel attention block (reference: block.py:782): 1x1+GELU -> FFT
    gated by pooled stats -> spatial channel attention -> FGM -> ReLU."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        out = conv2d(x, d, 1, 1, 0, bias=True, dtype=self.dtype, name="in_conv_0")
        out = jax.nn.gelu(out, approximate=False)
        # fca: FFT scaled by pooled channel gate
        pooled = out.mean(axis=(1, 2), keepdims=True)
        x_att = conv2d(pooled, d, 1, 1, 0, bias=True, dtype=self.dtype, name="fac_conv")
        x_fft = jnp.fft.fft2(out.astype(jnp.float32), axes=(1, 2))
        x_fca = jnp.abs(jnp.fft.ifft2(x_att.astype(jnp.float32) * x_fft, axes=(1, 2))).astype(out.dtype)
        # sca: channel gate on the fca output
        att2 = conv2d(x_fca.mean(axis=(1, 2), keepdims=True), d, 1, 1, 0, bias=True, dtype=self.dtype, name="conv")
        x_sca = att2 * x_fca
        x_sca = FGM(d, dtype=self.dtype, name="fgm")(x_sca, train)
        return jax.nn.relu(x_sca)


# ---------------------------------------------------------------------------
# Conv hybrids (reference: conv.py:623-1010)
# ---------------------------------------------------------------------------


class ConvOMN(nn.Module):
    """Conv + FFT-attention (reference: conv.py:623)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c1, self.c2, self.k, self.s, d=self.d, act=self.act, dtype=self.dtype, name="conv")(x, train)
        return BottleNect(self.c2, dtype=self.dtype, name="omn")(y, train)


class DDWConv(nn.Module):
    """Grouped conv (g=8) + pointwise (reference: conv.py:694)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c1, self.c2, self.k, self.s, g=8, d=self.d, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        return Conv(self.c2, self.c2, 1, 1, dtype=self.dtype, name="conv2")(y, train)


class MaxConv(nn.Module):
    """Grouped downsample + horizontal max-pool branch concat (reference: conv.py:923)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = Conv(self.c1, self.c2 // 2, self.k, self.s, g=8, dtype=self.dtype, name="conv2")(x, train)
        x1 = Conv(self.c2 // 2, self.c2 // 2, 1, 1, dtype=self.dtype, name="conv3")(x1, train)
        x2 = max_pool2d(x1, (self.k, 1), 1, (self.k // 2, 0))
        return jnp.concatenate([x1, x2], axis=-1)


class MaxConvHCA(nn.Module):
    """Time-axis max-pool downsample + 1x1 + HCoordAtt (reference: conv.py:748)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = max_pool2d(x, (1, self.k), self.s, (0, self.k // 2))
        y = Conv(self.c1, self.c2, 1, 1, dtype=self.dtype, name="conv2")(x1, train)
        return HCoordAtt(self.c2, self.c2, 32, dtype=self.dtype, name="msc")(y, train)


class FilterMaxConv(nn.Module):
    """Conv downsample + horizontal max filter + HCoordAtt (reference: conv.py:773)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = Conv(self.c1, self.c2, self.k, self.s, dtype=self.dtype, name="conv2")(x, train)
        x2 = max_pool2d(x1, (1, self.k), 1, (0, self.k // 2))
        return HCoordAtt(self.c2, self.c2, 32, dtype=self.dtype, name="msc")(x2, train)


class PartialConvMax(nn.Module):
    """Conv + max branch -> squeeze-expand MLP (reference: conv.py:797)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = Conv(self.c1, self.c1, self.k, self.s, dtype=self.dtype, name="conv2")(x, train)
        x2 = max_pool2d(x1, (1, self.k), 1, (0, self.k // 2))
        x3 = jnp.concatenate([x1, x2], axis=-1)
        y = jax.nn.relu(conv2d(x3, 8, 1, 1, 0, bias=True, dtype=self.dtype, name="fc_0"))
        return jax.nn.relu(conv2d(y, self.c2, 1, 1, 0, bias=True, dtype=self.dtype, name="fc1_0"))


class ConvHCA(nn.Module):
    """Conv + Sobel spatial attention (reference: conv.py:829)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c1, self.c2, self.k, self.s, dtype=self.dtype, name="conv2")(x, train)
        return SobelSpatialAttention(7, dtype=self.dtype, name="hca")(y, train)


class GhostConvMax(nn.Module):
    """Ghost-style conv/max concat + HCoordAtt (reference: conv.py:845)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = Conv(self.c1, self.c1, self.k, self.s, dtype=self.dtype, name="conv2")(x, train)
        x2 = max_pool2d(x1, (self.k, 1), 1, (self.k // 2, 0))
        x3 = jnp.concatenate([x1, x2], axis=-1)
        y = Conv(self.c1 * 2, self.c2, 1, 1, dtype=self.dtype, name="conv3")(x3, train)
        return HCoordAtt(self.c2, self.c2, 32, dtype=self.dtype, name="hca")(y, train)


class GhostMaxConv(nn.Module):
    """Grouped ghost downsample + vertical max + HCoordAtt (reference: conv.py:880)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 2
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = Conv(self.c1, self.c2 // 2, self.k, self.s, g=8, dtype=self.dtype, name="conv2")(x, train)
        x1 = Conv(self.c2 // 2, self.c2 // 2, 1, 1, dtype=self.dtype, name="conv3")(x1, train)
        x2 = max_pool2d(x1, (self.k, 1), 1, (self.k // 2, 0))
        x3 = jnp.concatenate([x1, x2], axis=-1)
        return HCoordAtt(self.c2, self.c2, 32, dtype=self.dtype, name="hca")(x3, train)


class GhostConvHCA(nn.Module):
    """Fork GhostConv (3x3 dilated cheap branch) + HCoordAtt (reference: conv.py:1006)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(self.c1, c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, c_, 3, 1, None, 1, d=2, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        cat = jnp.concatenate([y, y2], axis=-1)
        return HCoordAtt(self.c2, self.c2, 32, dtype=self.dtype, name="hca")(cat, train)


class RecycleConv(nn.Module):
    """Weight-recycling chunked conv (reference: conv.py:165): the first
    channel-chunk owns the kernel; the other 7 reuse it scaled by a learned
    per-channel factor. Shared BN+SiLU across chunks."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = self.c1 // 8
        c_ = self.c2 // 8
        kk = (self.k, self.k) if isinstance(self.k, int) else tuple(self.k)
        p = autopad(self.k, self.p, self.d)
        w = self.param("conv", torch_kernel_init(), (kk[0], kk[1], c_in, c_))
        scale = self.param("trainable_scale", lambda key: jnp.ones((1, 1, c_in, 1), jnp.float32))
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                          dtype=jnp.float32, param_dtype=jnp.float32, name="bn_silu_0")
        chunks = jnp.split(x, 8, axis=-1)
        outs = []
        for i, ch in enumerate(chunks):
            kern = w if i == 0 else w * scale
            y = jax.lax.conv_general_dilated(
                ch.astype(jnp.float32), kern, (self.s, self.s), [(p, p), (p, p)],
                rhs_dilation=(self.d, self.d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(jax.nn.silu(bn(y)).astype(x.dtype))
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# SPPF variants (reference: block.py:343 Mix_SPPF, :387 SAPF)
# ---------------------------------------------------------------------------


class Mix_SPPF(nn.Module):
    """SPPF variant: SE-gated 1x1 + dw-conv branch + avg/max-pool branch,
    bilinear re-align, concat (reference: block.py:343). Dropout = identity
    here (inference semantics; training regularization deviation documented)."""

    c1: int
    c2: int
    k: int = 5
    dropout_rate: float = 0.3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x = SELayer(c_, dtype=self.dtype, name="se_layer_after_cv1")(x, train)
        b1 = Conv(c_, c_, 1, 1, dtype=self.dtype, name="conv1x1_se")(x, train)
        b1 = Conv(c_, c_, 1, 1, dtype=self.dtype, name="conv1x1_after_branch1")(b1, train)
        b1 = Conv(c_, c_, 3, 1, g=c_, dtype=self.dtype, name="dwconv")(b1, train)
        b2 = avg_pool2d(x, 2, 1, 0)
        b2 = max_pool2d(b2, 2, 1, 0)
        b2 = jax.image.resize(b2, b1.shape, method="linear")
        comb = jnp.concatenate([b1, b2], axis=-1)
        return Conv(c_ * 2, self.c2, 1, 1, dtype=self.dtype, name="conv1x1_final")(comb, train)


class SAPF(nn.Module):
    """SPPF with stacked dilated convs (reference: block.py:387)."""

    c1: int
    c2: int
    k: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        y0 = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = Conv(c_, c_, self.k, 1, d=1, dtype=self.dtype, name="dilated_conv1")(y0, train)
        y2 = Conv(c_, c_, self.k, 1, d=2, dtype=self.dtype, name="dilated_conv2")(y1, train)
        return Conv(c_ * 3, self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([y0, y1, y2], -1), train)


# ---------------------------------------------------------------------------
# Fusion + concat family (reference: conv.py:1854 Fusion, :2198 SelectChannel,
# :2215-2269 BiFPN_WConcat*)
# ---------------------------------------------------------------------------


class SelectChannel(nn.Module):
    """Shared channel gate over two inputs (reference: conv.py:2198)."""

    c1: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        fc = nn.Conv(self.c1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="fc")
        g0 = jax.nn.relu(fc(xs[0].mean(axis=(1, 2), keepdims=True)))
        g1 = jax.nn.relu(fc(xs[1].mean(axis=(1, 2), keepdims=True)))  # same weights (torch reuses the module)
        return xs[0] * g0 + xs[1] * g1


class Fusion(nn.Module):
    """Multi-input feature fusion (reference: conv.py:1854). parse_model
    hardcodes mode 'ESChannel' (nn/tasks.py:1133); other modes kept for
    API parity: weight / adaptive / concat / bifpn / SChannel / SChannel_new."""

    inc_list: Tuple[int, ...]
    fusion: str = "ESChannel"
    c1: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        xs = list(xs)
        mode = self.fusion
        n = len(xs)
        if mode == "weight":
            xs = [Conv(c, c, 1, dtype=self.dtype, name=f"fusion_conv_{i}")(x, train) for i, (x, c) in enumerate(zip(xs, self.inc_list))]
            return sum(xs)
        if mode == "adaptive":
            xs = [Conv(c, c, 1, dtype=self.dtype, name=f"fusion_conv_{i}")(x, train) for i, (x, c) in enumerate(zip(xs, self.inc_list))]
            w = Conv(sum(self.inc_list), n, 1, dtype=self.dtype, name="fusion_adaptive")(jnp.concatenate(xs, -1), train)
            w = jax.nn.softmax(w, axis=-1)
            return sum(w[..., i : i + 1] * xs[i] for i in range(n))
        if mode == "concat":
            return jnp.concatenate(xs, axis=-1)
        if mode == "bifpn":
            fw = self.param("fusion_weight", lambda k: jnp.ones((n,), jnp.float32))
            fw = jax.nn.relu(fw)
            fw = fw / (fw.sum() + 1e-4)
            return sum(fw[i] * xs[i] for i in range(n))
        if mode in {"SChannel", "SChannel_new"}:
            if mode == "SChannel":
                fc = nn.Conv(self.c1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="fc")
                gates = [jax.nn.relu(fc(x.mean(axis=(1, 2), keepdims=True))) for x in xs]
            else:
                fc0 = nn.Conv(8, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="fc_0")
                fc1 = nn.Conv(self.c1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="fc1_0")
                gates = [jax.nn.relu(fc1(jax.nn.relu(fc0(x.mean(axis=(1, 2), keepdims=True))))) for x in xs]
            return sum(x * g for x, g in zip(xs, gates))
        # ESChannel (default): GCT over the concat, chunked back, + spatial gate.
        # GCT is sized by the ACTUAL concatenated width (the reference sizes it
        # c1*n with c1=128, which only works when every input has 128 channels).
        cat = jnp.concatenate(xs, axis=-1)
        gct = GCT(cat.shape[-1], name=f"gsc{n}")(cat, train)
        chunks = jnp.split(gct, n, axis=-1)
        sab = WeightedSpatialAttention(3, dtype=self.dtype, name="sab")
        return sum(chunk + sab(x, train) for chunk, x in zip(chunks, xs))


def _bifpn_wconcat(module, xs, relu_weights: bool):
    n = len(xs)
    w = module.param("w", lambda k: jnp.ones((n,), jnp.float32))
    if relu_weights:
        w = jax.nn.relu(w)
    w = w / (w.sum() + 1e-4)
    cat = jnp.concatenate([w[i] * xs[i] for i in range(n)], axis=-1)
    return channel_shuffle(cat, 4)


class BiFPN_WConcat(nn.Module):
    """Learnable-weight concat + channel shuffle (reference: conv.py:2215)."""

    inc_list: Tuple[int, ...] = ()
    dimension: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return _bifpn_wconcat(self, xs, relu_weights=False)


class BiFPN_WConcat2(nn.Module):
    """(reference: conv.py:2240; signature is (dimension) only)."""

    dimension: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return _bifpn_wconcat(self, xs, relu_weights=True)


class BiFPN_WConcat3(nn.Module):
    """(reference: conv.py:2255)."""

    dimension: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return _bifpn_wconcat(self, xs, relu_weights=True)


class GlobalContext(nn.Module):
    """GCNet-style global context with scale MLP (reference: conv.py:2303)."""

    channels: int
    rd_ratio: float = 1.0 / 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        attn = conv2d(x, 1, 1, 1, 0, bias=True, dtype=self.dtype, name="conv_attn")  # (b,h,w,1)
        attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
        ctx = jnp.einsum("bnc,bn1->bc", x.reshape(b, h * w, c).astype(jnp.float32), attn.astype(jnp.float32))
        ctx = ctx[:, None, None, :].astype(x.dtype)
        rd = max(1, int(self.channels * self.rd_ratio))
        m = conv2d(ctx, rd, 1, 1, 0, bias=True, dtype=self.dtype, name="mlp_scale_fc1")
        m = nn.LayerNorm(dtype=jnp.float32, name="mlp_scale_norm")(m)
        m = jax.nn.relu(m)
        m = conv2d(m, self.channels, 1, 1, 0, bias=True, dtype=self.dtype, name="mlp_scale_fc2")
        return x * jax.nn.sigmoid(m)


# ---------------------------------------------------------------------------
# Fork CSP blocks (reference: block.py:473 XCBAM2C2f, :1706 C3k2GC,
# :1726 C3MSCk2, :1072 DenseCross, :586 BottleneckX_CBam, conv.py:2474 Faster_Block)
# ---------------------------------------------------------------------------


class Partial_conv3(nn.Module):
    """Partial conv with dilated refinement, split_cat mode (reference: conv.py:2435)."""

    dim: int
    n_div: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dc = self.dim // self.n_div
        x1, x2 = x[..., :dc], x[..., dc:]
        x1_1 = conv2d(x1, dc, 3, 1, 1, bias=False, dtype=self.dtype, name="partial_conv3_1")
        x1_2 = conv2d(x1_1, dc, 3, 1, 2, d=2, bias=False, dtype=self.dtype, name="partial_conv3_2")
        return jnp.concatenate([x1_1, x1_2, x2], axis=-1)


class Faster_Block(nn.Module):
    """FasterNet block: partial conv mixing + MLP with residual (reference: conv.py:2474).
    DropPath -> identity (deviation documented)."""

    inc: int
    dim: int
    n_div: int = 4
    mlp_ratio: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.inc != self.dim:
            x = Conv(self.inc, self.dim, 1, dtype=self.dtype, name="adjust_channel")(x, train)
        dc = self.dim // self.n_div
        dim_div = dc * 2 + (self.dim - dc)
        shortcut = x
        y = Partial_conv3(self.dim, self.n_div, dtype=self.dtype, name="spatial_mixing")(x, train)
        y = Conv(dim_div, self.dim * self.mlp_ratio, 1, dtype=self.dtype, name="mlp_0")(y, train)
        y = conv2d(y, self.dim, 1, 1, 0, bias=False, dtype=self.dtype, name="mlp_1")
        return shortcut + y


class BottleneckX_CBam(nn.Module):
    """Faster_Block bottleneck (reference: block.py:586)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Any = (3, 3)
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Faster_Block(self.c1, self.c2, dtype=self.dtype, name="cv1")(x, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class DenseCross(nn.Module):
    """Dense cross-shaped conv (reference: block.py:1072)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: int = 3
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        x1_1 = Conv(self.c1, c_, (self.k, 1), 1, dtype=self.dtype, name="cv1_1")(x, train)
        x1_2 = Conv(c_, self.c2, (1, self.k), 1, dtype=self.dtype, name="cv1_2")(x1_1 + x, train)
        y = x1_1 + x1_2
        return x + y if self.shortcut and self.c1 == self.c2 else y


class XCBAM2C2f(nn.Module):
    """R-ELAN-style block with Faster_Block bottlenecks (reference: block.py:473)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        ys = [Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for i in range(self.n):
            ys.append(
                BottleneckX_CBam(c_, c_, self.shortcut, self.g, k=3, e=1.0, dtype=self.dtype, name=f"m_{i}_0")(ys[-1], train)
            )
        out = Conv((1 + self.n) * c_, self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        return x + out


class C3GC(nn.Module):
    """C3 with global-context side branch (reference: block.py:505)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, c_, self.shortcut, self.g, k=((1, 1), (3, 3)), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        b = GlobalContext(c_, dtype=self.dtype, name="gc")(b, train)
        return Conv(2 * c_, self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3kGC(nn.Module):
    """C3GC whose inner blocks are BottleNect (reference: block.py:1717)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = BottleNect(c_, dtype=self.dtype, name=f"m_{i}")(a, train)
        b = GlobalContext(c_, dtype=self.dtype, name="gc")(b, train)
        return Conv(2 * c_, self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2GC(nn.Module):
    """C3k2 with BottleNect / C3kGC inner blocks (reference: block.py:1706)."""

    c1: int
    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Optional[Dtype] = None

    def inner(self, c: int, i: int):
        if self.c3k:
            return C3kGC(c, c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return BottleNect(c, dtype=self.dtype, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _c2f_forward(self, x, train, int(self.c2 * self.e))


class C3MSCk(C3):
    """C3 with DenseCross inner blocks (reference: block.py:1743)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = DenseCross(c_, c_, self.shortcut, self.g, k=3, e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(2 * c_, self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3MSCk2(nn.Module):
    """C3k2 with DenseCross / C3MSCk inner blocks (reference: block.py:1726)."""

    c1: int
    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Optional[Dtype] = None

    def inner(self, c: int, i: int):
        if self.c3k:
            return C3MSCk(c, c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return DenseCross(c, c, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _c2f_forward(self, x, train, int(self.c2 * self.e))


class MSBottleneck(nn.Module):
    """Bottleneck with MSC spatial attention front (reference: block.py:863)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Any = (3, 3)
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = MSCSpatialAttention(self.c2, dtype=self.dtype, name="msc")(x, train)
        y = Conv(self.c1, c_, self.k[0], 1, dtype=self.dtype, name="cv1")(y, train)
        y = Conv(c_, self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class DualChannelHConv(nn.Module):
    """Dual vertical-conv branch + squeeze-excite + HCoordAtt (reference: block.py:892)."""

    c1: int
    c2: int
    shortcut: bool = False
    g: int = 1
    k: int = 3
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        x3 = Conv(self.c1, c_, (3, 1), 1, dtype=self.dtype, name="cv3_1")(x, train)
        x7 = Conv(self.c1, c_, (3, 1), 1, dtype=self.dtype, name="cv7_1")(x, train)
        cat = jnp.concatenate([x3, x7], axis=-1)
        y = Conv(2 * c_, c_, 1, act="relu", dtype=self.dtype, name="se_0")(cat, train)
        y = Conv(c_, self.c2, 1, act="relu", dtype=self.dtype, name="se_1")(y, train)
        y = HCoordAtt(self.c2, self.c2, 32, dtype=self.dtype, name="hca")(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y
