"""TinyViT image encoder for MobileSAM, flax/NHWC.

Counterpart of /root/reference/ultralytics/models/sam/modules/tiny_encoder.py
(:24 Conv2d_BN, :62 PatchEmbed, :104 MBConv, :165 PatchMerging, :222 ConvLayer,
:315 Mlp, :363 Attention, :492 TinyViTBlock, :650 BasicLayer, :765 TinyViT)
and build.py:56 build_mobile_sam.

TPU-first notes:
- NHWC end to end; the reference flattens to (B, N, C) between stages and
  reshapes back inside every block — here feature maps stay (B, H, W, C) and
  only the windowed attention reshapes locally (pure static-shape reshapes).
- The relative attention-bias index grid is computed in numpy at trace time
  (static resolution), so the bias gather lowers to a constant-index take.
- Inference path (SAM usage): BatchNorm runs on stored running stats; the
  torch state_dict converts mechanically (Conv2d_BN children named c/bn).
"""

from __future__ import annotations

import itertools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectrogram_yolov11_tpu.nn.modules.conv import conv2d
from spectrogram_yolov11_tpu.nn.modules.transformer import LayerNorm2d
from spectrogram_yolov11_tpu.models.sam import window_partition, window_unpartition

Dtype = Any
_LN = dict(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32)


class Conv2dBN(nn.Module):
    """Conv (no bias) + BatchNorm, children named c/bn (reference :24)."""

    c2: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    bn_weight_init: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(x, self.c2, self.ks, self.stride, self.pad, g=self.groups, bias=False,
                   dtype=self.dtype, name="c")
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                            dtype=jnp.float32 if train else x.dtype,
                            scale_init=nn.initializers.constant(self.bn_weight_init),
                            param_dtype=jnp.float32, name="bn")(x)


class TinyPatchEmbed(nn.Module):
    """Two stride-2 Conv2dBN stages: img -> img/4 (reference :62)."""

    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2dBN(self.embed_dim // 2, 3, 2, 1, dtype=self.dtype, name="seq_0")(x, train)
        x = jax.nn.gelu(x, approximate=False)
        return Conv2dBN(self.embed_dim, 3, 2, 1, dtype=self.dtype, name="seq_2")(x, train)


class MBConv(nn.Module):
    """Mobile inverted bottleneck block (reference :104)."""

    out_chans: int
    expand_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(x.shape[-1] * self.expand_ratio)
        shortcut = x
        x = jax.nn.gelu(Conv2dBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train), approximate=False)
        x = jax.nn.gelu(Conv2dBN(hidden, 3, 1, 1, groups=hidden, dtype=self.dtype, name="conv2")(x, train),
                        approximate=False)
        x = Conv2dBN(self.out_chans, 1, bn_weight_init=0.0, dtype=self.dtype, name="conv3")(x, train)
        return jax.nn.gelu(x + shortcut, approximate=False)


class PatchMerging(nn.Module):
    """Downsample + project between stages (reference :165). NHWC in/out."""

    out_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride_c = 1 if self.out_dim in {320, 448, 576} else 2
        x = jax.nn.gelu(Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, train), approximate=False)
        x = jax.nn.gelu(Conv2dBN(self.out_dim, 3, stride_c, 1, groups=self.out_dim, dtype=self.dtype,
                                 name="conv2")(x, train), approximate=False)
        return Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, train)


class TinyAttention(nn.Module):
    """Window attention with trainable relative-position biases (reference :363).

    Input (B, N, C) where N = resolution^2; the offset->bias index grid is a
    numpy constant, so the per-head bias table gathers statically.
    """

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 1.0
    resolution: Tuple[int, int] = (7, 7)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        nh, kd = self.num_heads, self.key_dim
        d = int(self.attn_ratio * kd)

        points = list(itertools.product(range(self.resolution[0]), range(self.resolution[1])))
        assert N == len(points), f"attention resolution {self.resolution} != token count {N}"
        offsets, idxs = {}, []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                offsets.setdefault(off, len(offsets))
                idxs.append(offsets[off])
        bias_idx = np.asarray(idxs, np.int32).reshape(N, N)
        biases = self.param("attention_biases", nn.initializers.zeros, (nh, len(offsets)), jnp.float32)

        x = nn.LayerNorm(**_LN, name="norm")(x)
        qkv = nn.Dense((kd * 2 + d) * nh, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, nh, kd * 2 + d)
        q, k, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]
        attn = jnp.einsum("bqhc,bkhc->bhqk", q, k) * (kd**-0.5) + biases[:, bias_idx]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, N, d * nh)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention + depthwise local conv + MLP (reference :492). NHWC."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    local_conv_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        res_x = x
        ws = self.window_size
        attn = TinyAttention(self.dim, self.dim // self.num_heads, self.num_heads, 1.0,
                             (ws, ws), dtype=self.dtype, name="attn")
        if H == ws and W == ws:
            x = attn(x.reshape(B, H * W, C)).reshape(B, H, W, C)
        else:
            wins, pad_hw = window_partition(x, ws)
            wins = attn(wins.reshape(wins.shape[0], ws * ws, C)).reshape(-1, ws, ws, C)
            x = window_unpartition(wins, ws, pad_hw, (H, W))
        x = res_x + x
        x = Conv2dBN(self.dim, self.local_conv_size, 1, self.local_conv_size // 2, groups=self.dim,
                     dtype=self.dtype, name="local_conv")(x, train)
        return x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(x)


class Mlp(nn.Module):
    """norm -> fc1 -> gelu -> fc2 (reference :315)."""

    hidden: int
    out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(**_LN, name="norm")(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(jax.nn.gelu(x, approximate=False))


class ConvLayer(nn.Module):
    """Stage 0: MBConv stack + patch merging (reference :222)."""

    dim: int
    depth: int
    expand_ratio: float = 4.0
    downsample_out: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(self.depth):
            x = MBConv(self.dim, self.expand_ratio, dtype=self.dtype, name=f"blocks_{j}")(x, train)
        if self.downsample_out is not None:
            x = PatchMerging(self.downsample_out, dtype=self.dtype, name="downsample")(x, train)
        return x


class BasicLayer(nn.Module):
    """Attention stage: TinyViT blocks + optional patch merging (reference :650)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    downsample_out: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(self.depth):
            x = TinyViTBlock(self.dim, self.num_heads, self.window_size, self.mlp_ratio,
                             dtype=self.dtype, name=f"blocks_{j}")(x, train)
        if self.downsample_out is not None:
            x = PatchMerging(self.downsample_out, dtype=self.dtype, name="downsample")(x, train)
        return x


class TinyViT(nn.Module):
    """MobileSAM trunk: MBConv stage + 3 attention stages + SAM neck
    (reference :765; geometry from build.py:56 build_mobile_sam).

    (B, S, S, 3) -> (B, S/16, S/16, 256).
    """

    img_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TinyPatchEmbed(self.embed_dims[0], dtype=self.dtype, name="patch_embed")(x, train)
        n_layers = len(self.depths)
        for i in range(n_layers):
            down = self.embed_dims[i + 1] if i < n_layers - 1 else None
            if i == 0:
                x = ConvLayer(self.embed_dims[0], self.depths[0], self.mbconv_expand_ratio,
                              downsample_out=down, dtype=self.dtype, name=f"layers_{i}")(x, train)
            else:
                x = BasicLayer(self.embed_dims[i], self.depths[i], self.num_heads[i],
                               self.window_sizes[i], self.mlp_ratio, downsample_out=down,
                               dtype=self.dtype, name=f"layers_{i}")(x, train)
        # SAM neck (reference :905): 1x1 -> LN2d -> 3x3 -> LN2d, 256ch
        y = conv2d(x, 256, 1, bias=False, dtype=self.dtype, name="neck_0")
        y = LayerNorm2d(256, name="neck_1")(y)
        y = conv2d(y, 256, 3, 1, 1, bias=False, dtype=self.dtype, name="neck_2")
        return LayerNorm2d(256, name="neck_3")(y)
