"""SAM2 (Segment Anything 2): Hiera encoder + memory attention + video predictor.

Counterpart of /root/reference/ultralytics/models/sam/ SAM2 tier
(modules/encoders.py:378 MemoryEncoder, :446 ImageEncoder, :501 FpnNeck, :645
Hiera; modules/blocks.py:54 MaskDownSampler, :114 CXBlock, :208 Fuser, :405
RoPEAttention, :503 MultiScaleAttention, :583 MultiScaleBlock, :698
PositionEmbeddingSine; modules/decoders.py:176 SAM2MaskDecoder;
modules/memory_attention.py:12; modules/sam.py:105 SAM2Model;
predict.py SAM2Predictor/SAM2VideoPredictor; build.py:216 _build_sam2).

TPU-first redesign notes (NOT a torch translation):

- NHWC + batch-first (B, N, C) everywhere. The reference is BCHW and runs its
  memory attention seq-first with permutes on entry/exit; here there are no
  layout round-trips — convs consume NHWC directly and attention consumes
  (B, N, C) views of the same buffers.
- Real-valued rotary encoding. The reference RoPE uses complex tensors
  (utils.py:82 compute_axial_cis / :104 apply_rotary_enc); this TPU backend
  supports neither complex transfer nor complex math, so the rotation is the
  algebraically identical (cos, sin) pair form. A parity test checks it
  against the torch reference bit-for-bit (tests/test_sam2.py).
- Fixed-shape memory bank. The reference concatenates a *variable* number of
  memories per frame (sam.py:620 _prepare_memory_conditioned_features), which
  under XLA would recompile every time the bank occupancy changes. Here the
  bank is a static (num_maskmem, N, mem_dim) array plus a validity mask that
  feeds an additive attention bias, and object pointers live in a static FIFO
  of max_obj_ptrs slots — ONE compiled track-step program serves every frame
  of the video. Invalid slots attend as -inf.
- Static prompt padding, like the SAM1 port: points are padded with label -1
  ("not a point", reference sam.py:459-461) so any click count reuses the
  same program.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectrogram_yolov11_tpu.nn.modules.conv import conv2d, conv_transpose2d
from spectrogram_yolov11_tpu.nn.modules.transformer import MLP, LayerNorm2d
from spectrogram_yolov11_tpu.models.sam import (
    PromptEncoder,
    TwoWayTransformer,
    window_partition,
    window_unpartition,
)

Dtype = Any

NO_OBJ_SCORE = -1024.0  # reference modules/sam.py:24


# ---------------------------------------------------------------------------
# rotary position encoding (real-valued)
# ---------------------------------------------------------------------------


def axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Axial 2D RoPE tables as (cos, sin), each (end_x*end_y, dim//2).

    Matches reference utils.py:82 compute_axial_cis: the first dim//4 complex
    freqs rotate with the x coordinate, the last dim//4 with y; here the
    complex table e^{i f} is carried as (cos f, sin f).
    """
    n4 = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[:n4].astype(np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x, t_y = t % end_x, np.floor(t / end_x)
    fx = np.outer(t_x, freqs)  # (N, dim//4)
    fy = np.outer(t_y, freqs)
    f = np.concatenate([fx, fy], axis=-1)  # (N, dim//2)
    return jnp.asarray(np.cos(f)), jnp.asarray(np.sin(f))


def apply_rope(x, cos, sin):
    """Rotate adjacent channel pairs of x (..., N, hd) by the (cos, sin) table.

    Pairing matches torch.view_as_complex on a (..., hd//2, 2) reshape
    (reference utils.py:111): channel 2i is the real part, 2i+1 the imaginary.
    """
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """1D sine pe for scalar positions (reference utils.py:63). pos (...,) -> (..., dim)."""
    pe_dim = dim // 2
    dim_t = temperature ** (2 * (np.arange(pe_dim) // 2) / pe_dim)
    pe = pos[..., None] / jnp.asarray(dim_t, jnp.float32)
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def sine_pos_embed_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """DETR-style 2D sine embedding -> (h, w, dim) with y-half then x-half
    (reference blocks.py:698 PositionEmbeddingSine, normalize=True, scale=2pi)."""
    npf = dim // 2
    y = (np.arange(1, h + 1, dtype=np.float32) / (h + 1e-6)) * (2 * math.pi)
    x = (np.arange(1, w + 1, dtype=np.float32) / (w + 1e-6)) * (2 * math.pi)
    dim_t = temperature ** (2 * (np.arange(npf) // 2) / npf)
    py = y[:, None] / dim_t  # (h, npf)
    px = x[:, None] / dim_t
    # interleave sin on even idx, cos on odd idx (reference :806-807)
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])], axis=2).reshape(h, -1)
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])], axis=2).reshape(w, -1)
    pos = np.concatenate(
        [np.broadcast_to(py[:, None], (h, w, npf)), np.broadcast_to(px[None], (h, w, npf))], axis=-1
    )
    return jnp.asarray(pos)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


class RoPEAttention(nn.Module):
    """Attention with axial rotary encoding (reference blocks.py:405).

    Extensions over the reference, required by the fixed-shape memory design:
    `attn_bias` (additive, broadcastable to (B, nh, Nq, Nk)) masks invalid
    memory slots; `num_k_exclude_rope` is a static count of trailing key
    tokens (object pointers) that skip rotation, exactly the reference
    semantics (blocks.py:465-471) but resolved at trace time.
    """

    embedding_dim: int
    num_heads: int = 1
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q, k, v, feat_size: Tuple[int, int], num_k_exclude_rope: int = 0, attn_bias=None):
        internal = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = internal // nh
        d = dict(dtype=self.dtype, param_dtype=jnp.float32)
        qp = nn.Dense(internal, name="q_proj", **d)(q)
        kp = nn.Dense(internal, name="k_proj", **d)(k)
        vp = nn.Dense(internal, name="v_proj", **d)(v)
        B, Nq = qp.shape[:2]
        Nk = kp.shape[1]
        qh = qp.reshape(B, Nq, nh, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Nk, nh, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Nk, nh, hd).transpose(0, 2, 1, 3)

        w_, h_ = feat_size
        assert w_ * h_ == Nq, f"RoPE feat_size {feat_size} != query len {Nq}"
        cos, sin = axial_rope_cos_sin(hd, w_, h_, self.rope_theta)
        qh = apply_rope(qh, cos, sin)
        num_k_rope = Nk - num_k_exclude_rope
        if num_k_rope == Nq:
            kh_r = apply_rope(kh[:, :, :num_k_rope], cos, sin)
        else:
            assert self.rope_k_repeat and num_k_rope % Nq == 0
            r = num_k_rope // Nq
            cos_k = jnp.tile(cos, (r, 1))
            sin_k = jnp.tile(sin, (r, 1))
            kh_r = apply_rope(kh[:, :, :num_k_rope], cos_k, sin_k)
        kh = jnp.concatenate([kh_r, kh[:, :, num_k_rope:]], axis=2) if num_k_exclude_rope else kh_r

        attn = qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if attn_bias is not None:
            attn = attn + attn_bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, Nq, internal)
        return nn.Dense(self.embedding_dim, name="out_proj", **d)(out)


# ---------------------------------------------------------------------------
# Hiera trunk
# ---------------------------------------------------------------------------


class _GELUMLP(nn.Module):
    """2-layer GELU MLP with torch-translatable names (reference blocks.py:651
    uses MLP(..., num_layers=2, act=GELU); torch keys mlp.layers.{0,1})."""

    hidden: int
    out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="layers_0")(x)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="layers_1")(jax.nn.gelu(h, approximate=False))


class MultiScaleAttention(nn.Module):
    """Hiera attention with optional query max-pool (reference blocks.py:503)."""

    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int]] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = nn.Dense(self.dim_out * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, nh, hd)
        if self.q_stride:
            q = q.reshape(B, H, W, -1)
            q = nn.max_pool(q, self.q_stride, self.q_stride)  # torch MaxPool2d k=s=q_stride
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, nh, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqhc,bkhc->bhqk", q, k) / math.sqrt(hd), axis=-1
        )
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention + optional q-pool + MLP (reference blocks.py:583)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int]] = None
    window_size: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        shortcut = x  # (B, H, W, C)
        x = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, param_dtype=jnp.float32, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(x)
            if self.q_stride:
                shortcut = nn.max_pool(shortcut, self.q_stride, self.q_stride)
        window_size = self.window_size
        if window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, window_size)
        x = MultiScaleAttention(self.dim_out, self.num_heads, self.q_stride, dtype=self.dtype, name="attn")(x)
        if self.q_stride:
            # shapes shrank under q-pool; window bookkeeping follows the reference (blocks.py:679-686)
            window_size = self.window_size // self.q_stride[0]
            H, W = shortcut.shape[1:3]
            pad_h = (window_size - H % window_size) % window_size
            pad_w = (window_size - W % window_size) % window_size
            pad_hw = (H + pad_h, W + pad_w)
        if self.window_size > 0:
            x = window_unpartition(x, window_size, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, param_dtype=jnp.float32, name="norm2")(x)
        return x + _GELUMLP(int(self.dim_out * self.mlp_ratio), self.dim_out, dtype=self.dtype, name="mlp")(y)


class _HieraPatchEmbed(nn.Module):
    """7x7 stride-4 conv patch embed, child named proj (reference blocks.py:1073)."""

    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv2d(x, self.embed_dim, 7, 4, 3, bias=True, dtype=self.dtype, name="proj")


class Hiera(nn.Module):
    """Hierarchical windowed ViT trunk -> 4 feature levels (reference encoders.py:645).

    Outputs NHWC features at strides 4/8/16/32 with channels embed_dim * 2^k.
    """

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    q_stride: Tuple[int, int] = (2, 2)
    q_pool: int = 3
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]

        x = _HieraPatchEmbed(self.embed_dim, dtype=self.dtype, name="patch_embed")(x)
        B, H, W, _ = x.shape

        # windowed absolute position embedding (reference encoders.py:727-777):
        # a background embedding interpolated to (H, W) plus a tiled window
        # embedding. NOTE: jax bicubic differs from torch's by ~1e-3 on the
        # interpolated background term (different kernel taps) — the only
        # non-exact piece of this encoder (see tests/test_sam2.py)
        pos_bkg = self.param("pos_embed", nn.initializers.zeros,
                             (1, *self.window_pos_embed_bkg_spatial_size, self.embed_dim), jnp.float32)
        ws0 = self.window_spec[0]
        pos_win = self.param("pos_embed_window", nn.initializers.zeros, (1, ws0, ws0, self.embed_dim), jnp.float32)
        pos = jax.image.resize(pos_bkg, (1, H, W, self.embed_dim), method="bicubic")
        pos = pos + jnp.tile(pos_win, (1, H // ws0, W // ws0, 1))
        x = x + pos

        outputs = []
        dim = self.embed_dim
        heads = self.num_heads
        cur_stage = 1
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = dim * 2
                heads = heads * 2
                cur_stage += 1
            x = MultiScaleBlock(
                dim=dim, dim_out=dim_out, num_heads=heads,
                q_stride=self.q_stride if i in q_pool_blocks else None,
                window_size=window_size, dtype=self.dtype, name=f"blocks_{i}",
            )(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # high-res -> low-res, NHWC


class _FpnLateral(nn.Module):
    """1x1 lateral conv wrapper so torch keys neck.convs.N.conv.* translate."""

    d_model: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv2d(x, self.d_model, 1, 1, 0, bias=True, dtype=self.dtype, name="conv")


class FpnNeck(nn.Module):
    """FPN neck: lateral 1x1 convs + nearest top-down on the two lowest-res
    levels (reference encoders.py:501; fpn_top_down_levels=[2, 3] in build.py:258)."""

    d_model: int = 256
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)  # low-res -> high-res
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        """xs: Hiera outputs high-res -> low-res. Returns (features, pos) same order."""
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):  # low-res first (top-down)
            lateral = _FpnLateral(self.d_model, dtype=self.dtype, name=f"convs_{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                top_down = jax.image.resize(
                    prev, (prev.shape[0], prev.shape[1] * 2, prev.shape[2] * 2, prev.shape[3]), method="nearest"
                )
                prev = lateral + top_down
            else:
                prev = lateral
            out[i] = prev
            pos[i] = sine_pos_embed_2d(prev.shape[1], prev.shape[2], self.d_model)
        return out, pos


class ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck, lowest-res level scalped (reference encoders.py:446)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    scalp: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # bkg pos-embed grid is (7, 7) for every SAM2 build (build.py:222
        # encoder_window_spatial_size default, never overridden per variant)
        feats = Hiera(self.embed_dim, self.num_heads, stages=self.stages,
                      global_att_blocks=self.global_att_blocks, window_spec=self.window_spec,
                      window_pos_embed_bkg_spatial_size=(7, 7),
                      dtype=self.dtype, name="trunk")(x)
        feats, pos = FpnNeck(256, self.backbone_channel_list, dtype=self.dtype, name="neck")(feats)
        if self.scalp:
            feats, pos = feats[: -self.scalp], pos[: -self.scalp]
        return feats, pos  # 3 levels: stride 4, 8, 16


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------


class CXBlock(nn.Module):
    """ConvNeXt block, NHWC (reference blocks.py:114)."""

    dim: int
    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        inp = x
        x = conv2d(x, self.dim, self.kernel_size, 1, self.kernel_size // 2, g=self.dim, bias=True,
                   dtype=self.dtype, name="dwconv")
        x = LayerNorm2d(self.dim, eps=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32)
        return inp + gamma * x


class MaskDownSampler(nn.Module):
    """Mask (B, H, W, 1) -> (B, H/16, W/16, embed_dim) by strided convs
    (reference blocks.py:54; build uses kernel 3 / stride 2 / pad 1 x4)."""

    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    total_stride: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        cin = 1
        for i in range(num_layers):
            cout = cin * self.stride**2
            x = conv2d(x, cout, self.kernel_size, self.stride, self.kernel_size // 2, bias=True,
                       dtype=self.dtype, name=f"encoder_{3 * i}")
            x = LayerNorm2d(cout, name=f"encoder_{3 * i + 1}")(x)
            x = jax.nn.gelu(x, approximate=False)
            cin = cout
        return conv2d(x, self.embed_dim, 1, 1, 0, bias=True, dtype=self.dtype, name=f"encoder_{3 * num_layers}")


class Fuser(nn.Module):
    """Stack of CXBlocks (reference blocks.py:208; torch keys fuser.layers.{i})."""

    dim: int
    num_layers: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = CXBlock(self.dim, dtype=self.dtype, name=f"layers_{i}")(x)
        return x


class MemoryEncoder(nn.Module):
    """(pixel features, mask) -> compressed spatial memory (reference encoders.py:378).

    Returns (B, H, W, out_dim) features plus their (H, W, out_dim) sine pos enc.
    """

    out_dim: int = 64
    in_dim: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pix_feat, masks, skip_mask_sigmoid: bool = False):
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(self.in_dim, dtype=self.dtype, name="mask_downsampler")(masks)
        x = conv2d(pix_feat, self.in_dim, 1, 1, 0, bias=True, dtype=self.dtype, name="pix_feat_proj")
        x = x + masks
        x = Fuser(self.in_dim, 2, dtype=self.dtype, name="fuser")(x)
        if self.out_dim != self.in_dim:
            x = conv2d(x, self.out_dim, 1, 1, 0, bias=True, dtype=self.dtype, name="out_proj")
        pos = sine_pos_embed_2d(x.shape[1], x.shape[2], self.out_dim)
        return x, pos


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------


class MemoryAttentionLayer(nn.Module):
    """Self-attn + cross-attn(memory) + FFN (reference memory_attention.py:12).

    pos_enc placement matches the reference defaults: none at self-attn,
    keys-only at cross-attn.
    """

    d_model: int = 256
    dim_feedforward: int = 2048
    kv_in_dim: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, feat_size, num_k_exclude_rope: int = 0, attn_bias=None):
        ln = dict(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32)
        # self-attention (RoPE over the current frame's token grid)
        t2 = nn.LayerNorm(**ln, name="norm1")(tgt)
        t2 = RoPEAttention(self.d_model, num_heads=1, dtype=self.dtype, name="self_attn")(
            t2, t2, t2, feat_size=feat_size)
        tgt = tgt + t2
        # cross-attention to the memory bank (keys carry their pos enc)
        t2 = nn.LayerNorm(**ln, name="norm2")(tgt)
        t2 = RoPEAttention(self.d_model, num_heads=1, kv_in_dim=self.kv_in_dim, rope_k_repeat=True,
                           dtype=self.dtype, name="cross_attn_image")(
            t2, memory + pos, memory, feat_size=feat_size,
            num_k_exclude_rope=num_k_exclude_rope, attn_bias=attn_bias)
        tgt = tgt + t2
        # FFN
        t2 = nn.LayerNorm(**ln, name="norm3")(tgt)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(t2)
        h = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(jax.nn.relu(h))
        return tgt + h


class MemoryAttention(nn.Module):
    """Stack of memory attention layers (reference memory_attention.py:140)."""

    d_model: int = 256
    num_layers: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, curr, memory, curr_pos, memory_pos, feat_size, num_obj_ptr_tokens: int = 0, attn_bias=None):
        x = curr + 0.1 * curr_pos  # pos_enc_at_input (reference :208-209)
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, dtype=self.dtype, name=f"layers_{i}")(
                x, memory, memory_pos, curr_pos, feat_size,
                num_k_exclude_rope=num_obj_ptr_tokens, attn_bias=attn_bias)
        return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32, name="norm")(x)


# ---------------------------------------------------------------------------
# SAM2 mask decoder
# ---------------------------------------------------------------------------


class SAM2MaskDecoder(nn.Module):
    """MaskDecoder + object score token + high-res skip features
    (reference decoders.py:176). Returns all 4 mask tokens; selection happens
    in SAM2Model so it can stay jit-friendly."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings, dense_prompt_embeddings,
                 high_res_features=None):
        """image_embeddings (B, H, W, C) NHWC. Returns
        (masks (B, 4, 4H, 4W), iou (B, 4), mask_tokens_out (B, 4, C), obj_score_logits (B, 1))."""
        td = self.transformer_dim
        nm = self.num_multimask_outputs + 1
        obj_token = self.param("obj_score_token", nn.initializers.normal(1.0), (1, td), jnp.float32)
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, td), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, td), jnp.float32)

        B = sparse_prompt_embeddings.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([obj_token, iou_token, mask_tokens], 0)[None], (B, 2 + nm, td))
        tokens = jnp.concatenate([out_tokens, sparse_prompt_embeddings], axis=1)
        src = jnp.broadcast_to(image_embeddings, (B, *image_embeddings.shape[1:])) + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe, (B, *image_pe.shape[1:]))
        _, h, w, c = src.shape

        hs, src = TwoWayTransformer(2, td, 8, 2048, dtype=self.dtype, name="transformer")(src, pos_src, tokens)
        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2 : 2 + nm]

        src = src.reshape(B, h, w, c)
        up = conv_transpose2d(src, td // 4, 2, 2, dtype=self.dtype, name="output_upscaling_0")
        if high_res_features is not None:
            feat_s0, feat_s1 = high_res_features  # (B, 4h, 4w, td//8), (B, 2h, 2w, td//4)
            up = up + feat_s1
        up = jax.nn.gelu(LayerNorm2d(td // 4, name="output_upscaling_1")(up), approximate=False)
        up = conv_transpose2d(up, td // 8, 2, 2, dtype=self.dtype, name="output_upscaling_3")
        if high_res_features is not None:
            up = up + feat_s0
        up = jax.nn.gelu(up, approximate=False)

        hyper = jnp.stack(
            [MLP(td, td, td // 8, 3, name=f"output_hypernetworks_mlps_{i}")(mask_tokens_out[:, i])
             for i in range(nm)], axis=1)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)
        iou_pred = MLP(td, self.iou_head_hidden_dim, nm, self.iou_head_depth, sigmoid=True,
                       name="iou_prediction_head")(iou_token_out)  # iou_prediction_use_sigmoid
        obj_score_logits = MLP(td, td, 1, 3, name="pred_obj_score_head")(hs[:, 0])  # pred_obj_scores_mlp
        return masks, iou_pred, mask_tokens_out, obj_score_logits


def stability_score(mask_logits, delta: float = 0.05):
    """IoU between +delta / -delta thresholdings (reference decoders.py:456)."""
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)


# ---------------------------------------------------------------------------
# SAM2 model
# ---------------------------------------------------------------------------

SAM2_VARIANTS = {
    # reference build.py:68-118
    "sam2_t": dict(embed_dim=96, stages=(1, 2, 7, 2), num_heads=1, global_att_blocks=(5, 7, 9),
                   window_spec=(8, 4, 14, 7), backbone_channel_list=(768, 384, 192, 96)),
    "sam2_s": dict(embed_dim=96, stages=(1, 2, 11, 2), num_heads=1, global_att_blocks=(7, 10, 13),
                   window_spec=(8, 4, 14, 7), backbone_channel_list=(768, 384, 192, 96)),
    "sam2_b": dict(embed_dim=112, stages=(2, 3, 16, 3), num_heads=2, global_att_blocks=(12, 16, 20),
                   window_spec=(8, 4, 14, 7), backbone_channel_list=(896, 448, 224, 112)),
    "sam2_l": dict(embed_dim=144, stages=(2, 6, 36, 4), num_heads=2, global_att_blocks=(23, 33, 43),
                   window_spec=(8, 4, 16, 8), backbone_channel_list=(1152, 576, 288, 144)),
}


class SAM2Model(nn.Module):
    """Full SAM2: image encoder + memory machinery + SAM heads
    (reference modules/sam.py:105, built with the flags of build.py:267-300).

    Functional method surface (each jittable via `model.apply(vars, ...,
    method=...)`):
      - encode_image:   frame -> (feat_s0, feat_s1, pix_feat, pix_pos)
      - predict:        init-frame prompting (no memory; the no-mem embedding
                        is added directly, reference sam.py:759-763)
      - track:          memory-conditioned frame step over the static bank
      - encode_memory:  (pix_feat, high-res mask logits, obj score) -> bank entry
    """

    variant: str = "sam2_t"
    img_size: int = 512
    num_maskmem: int = 7
    mem_dim: int = 64
    max_obj_ptrs: int = 16
    # SAM2.1 extras (build.py:292-294, enabled for sam2.1 checkpoints):
    # spatial no-object memory embedding, projected + signed temporal
    # encodings on object pointers
    v2_1: bool = False
    dtype: Optional[Dtype] = None

    @property
    def embed_size(self) -> int:
        return self.img_size // 16

    def setup(self):
        cfg = SAM2_VARIANTS[self.variant]
        self.image_encoder = ImageEncoder(
            embed_dim=cfg["embed_dim"], num_heads=cfg["num_heads"], stages=cfg["stages"],
            global_att_blocks=cfg["global_att_blocks"], window_spec=cfg["window_spec"],
            backbone_channel_list=cfg["backbone_channel_list"], dtype=self.dtype)
        self.memory_attention = MemoryAttention(256, 4, dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(self.mem_dim, 256, dtype=self.dtype)
        es = self.embed_size
        self.sam_prompt_encoder = PromptEncoder(256, (es, es), (self.img_size, self.img_size), 16,
                                                dtype=self.dtype)
        self.sam_mask_decoder = SAM2MaskDecoder(256, dtype=self.dtype)
        # high-res skip projections (reference sam.py:601-602 precomputes them per frame)
        self.conv_s0 = nn.Conv(32, (1, 1), padding="VALID", dtype=self.dtype, param_dtype=jnp.float32)
        self.conv_s1 = nn.Conv(64, (1, 1), padding="VALID", dtype=self.dtype, param_dtype=jnp.float32)
        self.obj_ptr_proj = MLP(256, 256, 256, 3)  # use_mlp_for_obj_ptr_proj
        init = nn.initializers.truncated_normal(0.02)
        self.no_mem_embed = self.param("no_mem_embed", init, (1, 1, 256), jnp.float32)
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", init, (1, 1, 256), jnp.float32)
        self.maskmem_tpos_enc = self.param("maskmem_tpos_enc", init,
                                           (self.num_maskmem, 1, self.mem_dim), jnp.float32)
        self.no_obj_ptr = self.param("no_obj_ptr", init, (1, 256), jnp.float32)
        if self.v2_1:
            self.no_obj_embed_spatial = self.param("no_obj_embed_spatial", init, (1, self.mem_dim), jnp.float32)
            self.obj_ptr_tpos_proj = nn.Dense(self.mem_dim, param_dtype=jnp.float32)

    # -- encoder ------------------------------------------------------------

    def encode_image(self, img):
        """img (B, S, S, 3) normalized -> (feat_s0, feat_s1, pix_feat, pix_pos) NHWC."""
        feats, pos = self.image_encoder(img)
        feat_s0 = self.conv_s0(feats[0])  # stride 4, 32ch
        feat_s1 = self.conv_s1(feats[1])  # stride 8, 64ch
        return feat_s0, feat_s1, feats[2], pos[2]

    # -- SAM heads ----------------------------------------------------------

    def _sam_heads(self, pix_feat, points, labels, high_res_features, multimask_output: bool):
        """Reference sam.py:392 _forward_sam_heads. pix_feat (B, es, es, 256)."""
        B = pix_feat.shape[0]
        if points is None:
            points = jnp.zeros((B, 1, 2), jnp.float32)
            labels = jnp.full((B, 1), -1, jnp.int32)
        sparse, dense = self.sam_prompt_encoder(points=points, labels=labels, batch=B)
        image_pe = self.sam_prompt_encoder.get_dense_pe()
        masks, ious, mask_tokens_out, obj_score_logits = self.sam_mask_decoder(
            pix_feat, image_pe, sparse, dense, high_res_features=high_res_features)

        # hard no-object gate on the spatial masks (reference sam.py:497-501)
        is_obj = obj_score_logits > 0
        masks = jnp.where(is_obj[:, :, None, None], masks, NO_OBJ_SCORE)

        if multimask_output:
            out_masks, out_ious = masks[:, 1:], ious[:, 1:]
            # best-IoU selection (reference sam.py:514-521)
            best = jnp.argmax(out_ious, axis=-1)
            low_res_mask = jnp.take_along_axis(out_masks, best[:, None, None, None], axis=1)
            sam_token = jnp.take_along_axis(mask_tokens_out[:, 1:], best[:, None, None], axis=1)[:, 0]
        else:
            # dynamic fallback to the most stable multimask output (decoders.py:464)
            stab = stability_score(masks[:, 0:1])[:, 0]
            is_stable = stab >= 0.98
            best = jnp.argmax(ious[:, 1:], axis=-1)
            best_multi = jnp.take_along_axis(masks[:, 1:], best[:, None, None, None], axis=1)
            best_multi_iou = jnp.take_along_axis(ious[:, 1:], best[:, None], axis=1)
            low_res_mask = jnp.where(is_stable[:, None, None, None], masks[:, 0:1], best_multi)
            out_masks = low_res_mask
            out_ious = jnp.where(is_stable[:, None], ious[:, 0:1], best_multi_iou)
            sam_token = mask_tokens_out[:, 0]

        high_res_mask = jax.image.resize(
            low_res_mask, (B, 1, self.img_size, self.img_size), method="bilinear")
        # object pointer with occlusion handling (reference sam.py:526-536, fixed_no_obj_ptr)
        obj_ptr = self.obj_ptr_proj(sam_token)
        lam = is_obj[:, 0].astype(jnp.float32)[:, None]
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return out_masks, out_ious, low_res_mask, high_res_mask, obj_ptr, obj_score_logits

    # -- public steps ---------------------------------------------------------

    def predict(self, img, points, labels, multimask_output: bool = True):
        """Init/prompt frame: encode, add no-mem embedding, run SAM heads
        (reference directly_add_no_mem_embed path, sam.py:759-763)."""
        feat_s0, feat_s1, pix_feat, _ = self.encode_image(img)
        B, H, W, C = pix_feat.shape
        pix = (pix_feat.reshape(B, H * W, C) + self.no_mem_embed).reshape(B, H, W, C)
        return self._sam_heads(pix, points, labels, (feat_s0, feat_s1), multimask_output)

    def track(self, img, mem_feats, mem_pos, mem_valid, obj_ptrs, obj_ptr_tdiff, obj_ptr_valid):
        """Memory-conditioned step on a non-prompted frame.

        Args (static shapes; the bank layout is the TPU-native replacement for
        the reference's variable-length concat, sam.py:620):
            img:           (B, S, S, 3)
            mem_feats:     (B, num_maskmem, N_mem, mem_dim) spatial memories;
                           slot 0 = conditioning frame (t_pos 0), slots 1.. =
                           most recent previous frames (t_pos 1 = oldest kept).
            mem_pos:       (N_mem, mem_dim) shared spatial sine pos enc.
            mem_valid:     (B, num_maskmem) bool.
            obj_ptrs:      (B, max_obj_ptrs, 256).
            obj_ptr_tdiff: (B, max_obj_ptrs) int32 frame distances.
            obj_ptr_valid: (B, max_obj_ptrs) bool.
        """
        feat_s0, feat_s1, pix_feat, pix_pos = self.encode_image(img)
        B, H, W, C = pix_feat.shape
        curr = pix_feat.reshape(B, H * W, C)
        curr_pos = pix_pos.reshape(1, H * W, C)

        M, N = mem_feats.shape[1], mem_feats.shape[2]
        # temporal pos enc per slot: maskmem_tpos_enc[num_maskmem - t_pos - 1] (reference :695)
        tpos = self.maskmem_tpos_enc[::-1][:, None, :, :].transpose(1, 0, 2, 3)  # (1, M, 1, mem_dim)
        spatial_pos = jnp.broadcast_to(mem_pos[None, None], (B, M, N, self.mem_dim)) + tpos
        mem_tokens = mem_feats.reshape(B, M * N, self.mem_dim)
        mem_pos_tokens = spatial_pos.reshape(B, M * N, self.mem_dim)

        # object pointers: split each 256-d pointer into 4 mem_dim tokens with a
        # shared temporal sine pe (reference sam.py:736-754)
        P = obj_ptrs.shape[1]
        split = C // self.mem_dim
        # sam2.1 uses SIGNED distances and projects a 256-d sine pe down to
        # mem_dim (reference sam.py:715-743); sam2.0 uses |dt| at mem_dim
        t_norm = obj_ptr_tdiff.astype(jnp.float32) / max(self.max_obj_ptrs - 1, 1)
        if self.v2_1:
            ptr_pe = self.obj_ptr_tpos_proj(get_1d_sine_pe(t_norm, 256))  # (B, P, mem_dim)
        else:
            ptr_pe = get_1d_sine_pe(jnp.abs(t_norm), self.mem_dim)  # (B, P, mem_dim)
        ptr_tokens = obj_ptrs.reshape(B, P, split, self.mem_dim).reshape(B, P * split, self.mem_dim)
        ptr_pos = jnp.repeat(ptr_pe, split, axis=1)

        memory = jnp.concatenate([mem_tokens, ptr_tokens], axis=1)
        memory_pos = jnp.concatenate([mem_pos_tokens, ptr_pos], axis=1)
        valid = jnp.concatenate([
            jnp.repeat(mem_valid, N, axis=1),
            jnp.repeat(obj_ptr_valid, split, axis=1),
        ], axis=1)  # (B, M*N + P*split)
        attn_bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]  # (B, 1, 1, Nk)

        cond = self.memory_attention(curr, memory, curr_pos, memory_pos, feat_size=(W, H),
                                     num_obj_ptr_tokens=P * split, attn_bias=attn_bias)
        pix = cond.reshape(B, H, W, C)
        return self._sam_heads(pix, None, None, (feat_s0, feat_s1), multimask_output=False)

    def encode_memory(self, img, high_res_mask, obj_score_logits):
        """Encode a frame + predicted mask into a bank entry (reference sam.py:784).

        Applies the build-time sigmoid temperature (scale 20, bias -10,
        build.py:273-274), then the memory encoder; with v2_1, occluded frames
        (obj score <= 0) blend in the spatial no-object embedding
        (reference sam.py:818-824)."""
        _, _, pix_feat, _ = self.encode_image(img)
        m = jax.nn.sigmoid(high_res_mask) * 20.0 - 10.0
        m = jnp.transpose(m, (0, 2, 3, 1))  # (B, S, S, 1) NHWC
        feats, pos = self.memory_encoder(pix_feat, m, skip_mask_sigmoid=True)
        B, H, W, D = feats.shape
        feats = feats.reshape(B, H * W, D)
        if self.v2_1:
            is_obj = (obj_score_logits > 0).astype(jnp.float32)[:, :, None]  # (B, 1, 1)
            feats = feats + (1.0 - is_obj) * self.no_obj_embed_spatial[None]
        return feats, pos.reshape(H * W, D)

    def __call__(self, img, points, labels):
        """Init-everything forward for nn.Module.init: runs every method once."""
        out = self.predict(img, points, labels)
        B = img.shape[0]
        N = self.embed_size**2  # memory entries live at the stride-16 grid
        mem, mem_pos = self.encode_memory(img, out[3], out[5])
        mem_feats = jnp.broadcast_to(mem[:, None], (B, self.num_maskmem, N, self.mem_dim))
        mem_valid = jnp.ones((B, self.num_maskmem), bool)
        ptrs = jnp.broadcast_to(out[4][:, None], (B, self.max_obj_ptrs, 256))
        tdiff = jnp.ones((B, self.max_obj_ptrs), jnp.int32)
        pvalid = jnp.ones((B, self.max_obj_ptrs), bool)
        return self.track(img, mem_feats, mem_pos, mem_valid, ptrs, tdiff, pvalid)


# ---------------------------------------------------------------------------
# predictors
# ---------------------------------------------------------------------------


class SAM2Predictor:
    """Promptable image predictor over SAM2 (reference predict.py SAM2Predictor).

    Same surface as models.sam.SAMPredictor: set_image() then prompt().
    """

    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)

    def __init__(self, variant: str = "sam2_t", img_size: int = 512, variables=None, seed: int = 0,
                 v2_1: bool = False):
        self.model = SAM2Model(variant=variant, img_size=img_size, v2_1=v2_1)
        self.img_size = img_size
        self.variables = variables
        self._seed = seed
        self._image = None
        self._predict = jax.jit(
            lambda v, img, pts, lab, mm: self.model.apply(v, img, pts, lab, mm, method=SAM2Model.predict),
            static_argnums=(4,),
        )

    def _ensure_variables(self):
        if self.variables is None:
            S = self.img_size
            self.variables = self.model.init(
                jax.random.PRNGKey(self._seed), jnp.zeros((1, S, S, 3)),
                jnp.zeros((1, 2, 2)), jnp.full((1, 2), -1, jnp.int32))

    def preprocess(self, bgr: np.ndarray):
        import cv2

        h0, w0 = bgr.shape[:2]
        scale = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        im = cv2.resize(bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)[..., ::-1].astype(np.float32)
        im = (im - self.mean) / self.std
        canvas = np.zeros((self.img_size, self.img_size, 3), np.float32)
        canvas[:nh, :nw] = im
        return canvas[None], scale, (h0, w0)

    def set_image(self, bgr: np.ndarray) -> None:
        x, scale, orig = self.preprocess(bgr)
        self._ensure_variables()
        self._image = (jnp.asarray(x), scale, orig)

    def prompt(self, points=None, labels=None, boxes=None, multimask_output: bool = True):
        """Masks for point/box prompts in ORIGINAL pixel coords -> (masks, ious).

        Boxes become corner-point pairs with labels 2/3, exactly the SAM2
        convention (reference predict.py SAM2Predictor._prepare_prompts)."""
        assert self._image is not None, "call set_image() first"
        assert points is not None or boxes is not None, "give points and/or boxes"
        img, scale, (h0, w0) = self._image
        parts_p, parts_l = [], []
        if boxes is not None:
            b = (np.atleast_2d(np.asarray(boxes, np.float32)) * scale).reshape(1, -1, 2)  # corner points
            parts_p.append(b)
            parts_l.append(np.tile(np.asarray([[2, 3]], np.int32), (1, b.shape[1] // 2)))
        if points is not None:
            p = np.atleast_2d(np.asarray(points, np.float32))[None] * scale
            parts_p.append(p)
            parts_l.append(np.ones(p.shape[:2], np.int32) if labels is None
                           else np.atleast_2d(np.asarray(labels, np.int32)))
        pts = np.concatenate(parts_p, axis=1)
        lab = np.concatenate(parts_l, axis=1)
        if boxes is None:  # SAM pads a not-a-point only for point-only prompts
            pts = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
            lab = np.concatenate([lab, -np.ones((1, 1), np.int32)], axis=1)
        out_masks, out_ious, *_ = self._predict(self.variables, img, jnp.asarray(pts), jnp.asarray(lab),
                                                bool(multimask_output))
        m = jax.image.resize(out_masks, (*out_masks.shape[:2], self.img_size, self.img_size), method="bilinear")
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        m = jax.image.resize(m[:, :, :nh, :nw], (*out_masks.shape[:2], h0, w0), method="bilinear")
        return np.asarray(m > 0.0), np.asarray(out_ious)


class SAM2VideoPredictor:
    """Streaming video segmentation with the fixed-size memory bank
    (reference predict.py SAM2VideoPredictor + sam.py track_step).

    Bank policy (matches reference semantics for the single-conditioning-frame
    streaming case): slot 0 holds the prompted frame's memory forever; slots
    1..num_maskmem-1 are a FIFO of the most recent frames (slot M-1 = last
    frame). Object pointers keep the prompt frame's pointer plus the last
    (max_obj_ptrs - 1) frames' pointers with their frame distances.
    """

    def __init__(self, variant: str = "sam2_t", img_size: int = 512, variables=None, seed: int = 0,
                 v2_1: bool = False):
        self.m = SAM2Model(variant=variant, img_size=img_size, v2_1=v2_1)
        self.img_size = img_size
        self.variables = variables
        self._seed = seed
        self._jit_predict = jax.jit(lambda v, i, p, l: self.m.apply(v, i, p, l, method=SAM2Model.predict))
        self._jit_track = jax.jit(lambda v, i, *bank: self.m.apply(v, i, *bank, method=SAM2Model.track))
        self._jit_encmem = jax.jit(lambda v, i, hm, osl: self.m.apply(v, i, hm, osl, method=SAM2Model.encode_memory))
        self.reset()

    def reset(self):
        self._bank = None
        self._frame_idx = -1
        self._cond_frame = None

    def _ensure_variables(self, img):
        if self.variables is None:
            self.variables = self.m.init(
                jax.random.PRNGKey(self._seed), img, jnp.zeros((1, 2, 2)), jnp.full((1, 2), -1, jnp.int32))

    def _preprocess(self, bgr: np.ndarray):
        import cv2

        im = cv2.resize(bgr, (self.img_size, self.img_size), interpolation=cv2.INTER_LINEAR)
        im = (im[..., ::-1].astype(np.float32) - SAM2Predictor.mean) / SAM2Predictor.std
        return jnp.asarray(im[None])

    def add_new_points(self, frame_bgr: np.ndarray, points, labels=None):
        """Prompt the conditioning frame (frame 0 of the stream)."""
        img = self._preprocess(frame_bgr)
        self._ensure_variables(img)
        h0, w0 = frame_bgr.shape[:2]
        pts = np.atleast_2d(np.asarray(points, np.float32))[None] * np.array(
            [self.img_size / w0, self.img_size / h0], np.float32)
        lab = np.ones(pts.shape[:2], np.int32) if labels is None else np.atleast_2d(np.asarray(labels, np.int32))
        pts = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
        lab = np.concatenate([lab, -np.ones((1, 1), np.int32)], axis=1)
        out = self._jit_predict(self.variables, img, jnp.asarray(pts), jnp.asarray(lab))
        _, _, low_mask, high_mask, obj_ptr, obj_score = out
        mem, mem_pos = self._jit_encmem(self.variables, img, high_mask, obj_score)

        M, P = self.m.num_maskmem, self.m.max_obj_ptrs
        B, N, D = mem.shape
        bank = {
            "mem_feats": jnp.zeros((B, M, N, D)).at[:, 0].set(mem),
            "mem_pos": mem_pos,
            "mem_valid": jnp.zeros((B, M), bool).at[:, 0].set(True),
            "obj_ptrs": jnp.zeros((B, P, 256)).at[:, 0].set(obj_ptr),
            "obj_ptr_frames": np.full((P,), -10**9, np.int64),  # host-side frame indices
            "obj_ptr_valid": jnp.zeros((B, P), bool).at[:, 0].set(True),
        }
        bank["obj_ptr_frames"][0] = 0
        self._bank = bank
        self._frame_idx = 0
        self._next_ptr_slot = 1
        return np.asarray(high_mask[:, 0] > 0.0), float(obj_score[0, 0])

    def propagate(self, frame_bgr: np.ndarray):
        """Track the object into the next frame; returns (mask, obj_score)."""
        assert self._bank is not None, "call add_new_points() on the first frame"
        self._frame_idx += 1
        img = self._preprocess(frame_bgr)
        b = self._bank
        tdiff = jnp.asarray(
            np.clip(self._frame_idx - b["obj_ptr_frames"], 0, self.m.max_obj_ptrs - 1)[None], jnp.int32)
        out = self._jit_track(self.variables, img, b["mem_feats"], b["mem_pos"], b["mem_valid"],
                              b["obj_ptrs"], tdiff, b["obj_ptr_valid"])
        _, _, low_mask, high_mask, obj_ptr, obj_score = out

        # bank update: shift the non-cond FIFO (slots 1..M-1) left, append newest
        mem, _ = self._jit_encmem(self.variables, img, high_mask, obj_score)
        M = self.m.num_maskmem
        feats = b["mem_feats"]
        feats = feats.at[:, 1 : M - 1].set(feats[:, 2:M]).at[:, M - 1].set(mem)
        valid = b["mem_valid"]
        valid = valid.at[:, 1 : M - 1].set(valid[:, 2:M]).at[:, M - 1].set(True)
        b["mem_feats"], b["mem_valid"] = feats, valid

        # object-pointer FIFO over slots 1..P-1 (slot 0 = conditioning frame)
        P = self.m.max_obj_ptrs
        s = self._next_ptr_slot
        b["obj_ptrs"] = b["obj_ptrs"].at[:, s].set(obj_ptr)
        b["obj_ptr_valid"] = b["obj_ptr_valid"].at[:, s].set(True)
        b["obj_ptr_frames"][s] = self._frame_idx
        self._next_ptr_slot = 1 + (s % (P - 1))
        return np.asarray(high_mask[:, 0] > 0.0), float(obj_score[0, 0])


def sam2_state_preprocess(state: dict) -> dict:
    """Prepare a torch SAM2 state_dict for torch_compat conversion: the Hiera
    positional embeddings are stored NCHW ((1, C, 14, 14) / (1, C, w, w),
    encoders.py:729-730) while every other SAM tensor converts mechanically —
    transpose just those two to NHWC before translate_key mapping."""
    out = {}
    for k, v in state.items():
        if k.endswith(("pos_embed", "pos_embed_window")) and getattr(v, "ndim", 0) == 4:
            v = v.transpose(0, 2, 3, 1) if hasattr(v, "transpose") else v
        if "transformer" in k and ".mlp.layers." in k:
            # SAM2TwoWayAttentionBlock swaps SAM1's MLPBlock (lin1/lin2) for an
            # identically-shaped MLP named layers.{0,1} (blocks.py:264); our
            # shared TwoWayTransformer keeps the SAM1 names
            k = k.replace(".mlp.layers.0.", ".mlp.lin1.").replace(".mlp.layers.1.", ".mlp.lin2.")
        out[k] = v
    return out


class SAM2:
    """`SAM2('sam2_t')` facade mirroring models.sam.SAM (reference model.py)."""

    def __new__(cls, model: str = "sam2_t", video: bool = False, img_size: int = 512):
        from pathlib import Path

        name = Path(str(model)).name
        for ext in (".pt", ".ckpt", ".yaml"):  # NOT Path.stem: it eats "sam2.1"'s dot
            if name.endswith(ext):
                name = name[: -len(ext)]
        stem = name
        v2_1 = "sam2.1" in stem  # sam2.1_t etc. enable the 2.1 extras
        variant = stem.replace("sam2.1", "sam2").replace("-", "_")
        if variant not in SAM2_VARIANTS:
            raise ValueError(f"unknown SAM2 variant {model!r}; options: {sorted(SAM2_VARIANTS)}")
        cls_ = SAM2VideoPredictor if video else SAM2Predictor
        return cls_(variant=variant, img_size=img_size, v2_1=v2_1)
