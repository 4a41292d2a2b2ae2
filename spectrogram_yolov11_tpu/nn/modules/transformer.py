"""Transformer modules (flax.linen) for RT-DETR and friends.

TPU-native re-implementations of the reference transformer zoo
(/root/reference/ultralytics/nn/modules/transformer.py: TransformerEncoderLayer:28,
AIFI:86, MLP:174, LayerNorm2d:193, MSDeformAttn:218,
DeformableTransformerDecoderLayer:312, DeformableTransformerDecoder:374).

Design notes (TPU-first):
- Multi-scale deformable attention's grid_sample becomes a fixed-shape
  vectorized bilinear gather (`ms_deformable_attention`) — XLA lowers the
  4-corner gathers to batched dynamic-slices; shapes are static per level so
  the whole decoder is one fused program.
- Parameter names mirror the torch originals (in_proj_weight, out_proj,
  linear1, norm1, ...) so converted .pt weights map mechanically via
  utils/torch_compat.translate_key.
- Dropout rates in all RT-DETR configs are 0.0; dropout is omitted (the
  modules are deterministic pure functions).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def inverse_sigmoid(x, eps: float = 1e-5):
    """Logit with clamping (reference: nn/modules/utils.py:34)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def bias_init_with_prob(prior_prob: float = 0.01) -> float:
    """Initial bias so sigmoid(bias) == prior_prob (reference: utils.py:21)."""
    return float(-np.log((1 - prior_prob) / prior_prob))


class MultiheadAttention(nn.Module):
    """Torch-compatible multi-head attention (packed in_proj + out_proj).

    Equivalent of torch.nn.MultiheadAttention(batch_first=True) as used by the
    reference encoder/decoder layers. `attn_mask` uses torch bool semantics:
    True = position NOT allowed to attend.
    """

    embed_dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None):
        c, nh = self.embed_dim, self.num_heads
        hd = c // nh
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c), jnp.float32)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32)
        qp = q @ w[:c].T + b[:c]
        kp = k @ w[c : 2 * c].T + b[c : 2 * c]
        vp = v @ w[2 * c :].T + b[2 * c :]
        B, Lq = qp.shape[0], qp.shape[1]
        Lk = kp.shape[1]
        qh = qp.reshape(B, Lq, nh, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Lk, nh, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Lk, nh, hd).transpose(0, 2, 1, 3)
        logits = (qh @ kh.transpose(0, 1, 3, 2)) / math.sqrt(hd)  # (B, nh, Lq, Lk)
        if attn_mask is not None:
            neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
            logits = jnp.where(attn_mask[None, None].astype(bool), neg, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, Lq, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


def _encoder_layer_body(mod: nn.Module, src, pos, c1: int, cm: int, num_heads: int, dtype):
    """Shared post-norm encoder-layer body. Submodules are declared at `mod`'s
    own scope (ma/fc1/fc2/norm1/norm2) because the torch AIFI *inherits* from
    TransformerEncoderLayer, flattening these names into the layer itself."""
    q = k = src if pos is None else src + pos
    src2 = MultiheadAttention(c1, num_heads, dtype=dtype, name="ma", parent=mod)(q, k, src)
    src = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=dtype, param_dtype=jnp.float32, name="norm1", parent=mod)(src + src2)
    src2 = nn.Dense(cm, dtype=dtype, param_dtype=jnp.float32, name="fc1", parent=mod)(src)
    src2 = nn.Dense(c1, dtype=dtype, param_dtype=jnp.float32, name="fc2", parent=mod)(
        jax.nn.gelu(src2, approximate=False)
    )
    return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=dtype, param_dtype=jnp.float32, name="norm2", parent=mod)(src + src2)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (reference: transformer.py:28)."""

    c1: int
    cm: int = 2048
    num_heads: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, src, pos=None, train: bool = False):
        return _encoder_layer_body(self, src, pos, self.c1, self.cm, self.num_heads, self.dtype)


def build_2d_sincos_position_embedding(w: int, h: int, embed_dim: int = 256, temperature: float = 10000.0):
    """2D sine-cosine position embedding (reference: transformer.py:104)."""
    assert embed_dim % 4 == 0, "Embed dimension must be divisible by 4"
    grid_w, grid_h = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij")
    pos_dim = embed_dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1)[None]


class AIFI(nn.Module):
    """Intra-scale feature interaction over the P5 map (reference: transformer.py:86).

    NHWC in/out. NOTE the reference flattens NCHW via flatten(2), walking
    tokens H-major, while its position embedding is built W-major (meshgrid
    indexing='ij' over (w, h) then flatten) — a quirk we reproduce verbatim
    for weight parity.
    """

    c1: int
    cm: int = 2048
    num_heads: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        pos = build_2d_sincos_position_embedding(W, H, C).astype(x.dtype)
        tokens = x.reshape(B, H * W, C)
        out = _encoder_layer_body(self, tokens, pos, self.c1, self.cm, self.num_heads, self.dtype)
        return out.reshape(B, H, W, C)


class MLP(nn.Module):
    """Simple FFN stack (reference: transformer.py:174). Linen submodules are
    named layers_{i} so torch `layers.{i}.weight` keys translate directly."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid: bool = False
    dtype: Optional[Dtype] = None
    last_zero: bool = False  # RTDETR bbox heads init their last layer to zero
    xavier: bool = False  # query_pos_head layers use xavier (head.py:712-713)

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            last = i == self.num_layers - 1
            if last and self.last_zero:
                kinit = nn.initializers.zeros
            elif self.xavier:
                kinit = nn.initializers.xavier_uniform()
            else:
                kinit = nn.initializers.lecun_normal()
            x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, kernel_init=kinit, name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC maps (reference: transformer.py:193)."""

    num_channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        # params named scale/bias: torch 1-d `weight` translates to `scale`
        w = self.param("scale", nn.initializers.ones, (self.num_channels,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.num_channels,), jnp.float32)
        u = x.mean(-1, keepdims=True)
        s = ((x - u) ** 2).mean(-1, keepdims=True)
        return w * (x - u) / jnp.sqrt(s + self.eps) + b


def _bilinear_gather(v_flat, H: int, W: int, px, py):
    """Bilinear sample with zeros padding (grid_sample align_corners=False).

    v_flat: (B, H*W, C); px/py: (B, Q, P) pixel coords. Returns (B, Q, P, C).
    """
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    outs = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (1 - jnp.abs(px - xi)) * (1 - jnp.abs(py - yi))
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
        gathered = jnp.take_along_axis(v_flat[:, :, None, :], idx.reshape(idx.shape[0], -1)[:, :, None, None], axis=1)
        gathered = gathered.reshape(*idx.shape, v_flat.shape[-1])
        outs = outs + gathered * (wgt * inb)[..., None]
    return outs


def _patch_bilinear_sample(v_img, px, py):
    """Bilinear sample via ONE 2x2-patch gather (zeros padding semantics).

    v_img: (N, H, W, c); px/py: (N, S) pixel coords (may be out of range).
    Returns (N, S, c).

    TPU rationale: the naive formulation is four row-gathers of c elements —
    at c=32 that is a 64-byte row, 1/4 of a lane tile, and gather throughput
    collapses (measured 1.28 ms/img/call at RT-DETR decoder shapes, 6 calls =
    ~80%% of the whole model's latency). Gathering the 2x2xc patch in one
    lax.gather makes each row 4x wider and cuts the gather count 4x. Border
    handling: the map is zero-padded by 1 so true taps at -1/H/W read zeros,
    gather starts are clamped into range, and tap weights use max(0, 1-|d|)
    against the CLAMPED patch positions — taps the clamp moved away get
    weight 0, reproducing the reference grid_sample's zeros padding exactly.
    """
    N, H, W, c = v_img.shape
    S = px.shape[1]
    vp = jnp.pad(v_img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pxp = px.astype(jnp.float32) + 1.0
    pyp = py.astype(jnp.float32) + 1.0
    x0 = jnp.clip(jnp.floor(pxp), 0, W).astype(jnp.int32)   # slice size 2 -> start <= W
    y0 = jnp.clip(jnp.floor(pyp), 0, H).astype(jnp.int32)

    starts = jnp.stack([y0, x0], axis=-1)  # (N, S, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    patches = jax.vmap(
        lambda img, st: jax.lax.gather(img, st, dnums, slice_sizes=(2, 2, c), mode="clip")
    )(vp, starts)  # (N, S, 2, 2, c)

    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(pxp - x0.astype(jnp.float32)))
    wx2 = jnp.maximum(0.0, 1.0 - jnp.abs(pxp - (x0 + 1).astype(jnp.float32)))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(pyp - y0.astype(jnp.float32)))
    wy2 = jnp.maximum(0.0, 1.0 - jnp.abs(pyp - (y0 + 1).astype(jnp.float32)))
    wy = jnp.stack([wy1, wy2], -1)  # (N, S, 2) f32
    wx = jnp.stack([wx1, wx2], -1)
    # f32 accumulation regardless of the value dtype (matches the previous
    # formulation, where bf16 taps were weighted by f32 scalars)
    return jnp.einsum("nsyxc,nsy,nsx->nsc", patches, wy, wx,
                      preferred_element_type=jnp.float32)


def _packed_bilinear_sample(v_img, px, py):
    """Bilinear sample via one flat row-take from a space-to-depth table.

    v_img: (N, H, W, c); px/py: (N, S) pixel coords. Returns (N, S, c).

    TPU rationale (measured, round 4): XLA's gather costs ~20-40 ns PER ROW
    regardless of row width, so throughput is set by row count and by whether
    the row is one contiguous lane-aligned vector. The 2x2xc patch slice of
    `_patch_bilinear_sample` spans 2 strided 64-byte segments (~40 ns/row);
    packing each pixel's 2x2 patch contiguously (space-to-depth into a
    (N*(H+1)*(W+1), 4c) table, 4c = 128 lanes at c=32) and doing ONE flat
    jnp.take halves that (measured 12.4 -> 5.9 ms at RT-DETR level-0 shapes
    bs32; the pack itself is dense streaming, ~1 ms at level 0 and falling
    quadratically for smaller levels). Border handling is identical to
    `_patch_bilinear_sample` (zeros padding; clamped taps get weight 0),
    asserted by tests/test_patch_sampler.py.
    """
    N, H, W, c = v_img.shape
    S = px.shape[1]
    Hp, Wp = H + 1, W + 1
    vp = jnp.pad(v_img, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (N, H+2, W+2, c)
    packed = jnp.concatenate(  # entry (y, x) holds the 2x2 patch at vp[y:y+2, x:x+2]
        [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]], -1
    ).reshape(N * Hp * Wp, 4 * c)
    pxp = px.astype(jnp.float32) + 1.0
    pyp = py.astype(jnp.float32) + 1.0
    x0 = jnp.clip(jnp.floor(pxp), 0, W).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(pyp), 0, H).astype(jnp.int32)
    gid = (jnp.arange(N, dtype=jnp.int32)[:, None] * (Hp * Wp) + y0 * Wp + x0).reshape(-1)
    rows = jnp.take(packed, gid, axis=0).reshape(N, S, 2, 2, c)  # tap order (y, x)
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(pxp - x0.astype(jnp.float32)))
    wx2 = jnp.maximum(0.0, 1.0 - jnp.abs(pxp - (x0 + 1).astype(jnp.float32)))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(pyp - y0.astype(jnp.float32)))
    wy2 = jnp.maximum(0.0, 1.0 - jnp.abs(pyp - (y0 + 1).astype(jnp.float32)))
    wy = jnp.stack([wy1, wy2], -1)
    wx = jnp.stack([wx1, wx2], -1)
    # f32 accumulation regardless of the value dtype (matches _patch_bilinear_sample)
    return jnp.einsum("nsyxc,nsy,nsx->nsc", rows, wy, wx,
                      preferred_element_type=jnp.float32)


def ms_deformable_attention(value, shapes: Sequence[Tuple[int, int]], sampling_locations, attention_weights):
    """Multi-scale deformable attention core (reference: nn/modules/utils.py:42).

    value: (B, len_v, nh, c); shapes: static [(H, W), ...];
    sampling_locations: (B, Lq, nh, nl, np, 2) in [0, 1];
    attention_weights: (B, Lq, nh, nl, np). Returns (B, Lq, nh*c).
    """
    B, _, nh, c = value.shape
    Lq = sampling_locations.shape[1]
    npts = sampling_locations.shape[-2]
    sampled = []
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        v = value[:, start : start + H * W]  # (B, HW, nh, c)
        start += H * W
        v = v.transpose(0, 2, 1, 3).reshape(B * nh, H, W, c)
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, nh, np, 2)
        px = (loc[..., 0] * W - 0.5).transpose(0, 2, 1, 3).reshape(B * nh, Lq * npts)
        py = (loc[..., 1] * H - 0.5).transpose(0, 2, 1, 3).reshape(B * nh, Lq * npts)
        s = _packed_bilinear_sample(v, px, py)  # (B*nh, Lq*np, c)
        sampled.append(s.reshape(B * nh, Lq, npts, c))
    sv = jnp.stack(sampled, axis=2)  # (B*nh, Lq, nl, np, c)
    aw = attention_weights.transpose(0, 2, 1, 3, 4).reshape(B * nh, Lq, len(shapes), npts)
    out = (sv * aw[..., None].astype(sv.dtype)).sum(axis=(2, 3))  # (B*nh, Lq, c)
    return out.reshape(B, nh, Lq, c).transpose(0, 2, 1, 3).reshape(B, Lq, nh * c)


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference MSDeformAttn._reset_parameters grid bias (transformer.py:246)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(flat, dtype).reshape(shape)

    return init


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (reference: transformer.py:218)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes: Sequence[Tuple[int, int]]):
        """query (B, Lq, C); refer_bbox (B, Lq, nl, 2|4) in [0,1]; value (B, Lv, C)."""
        B, Lq = query.shape[:2]
        Lv = value.shape[1]
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        value = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name="value_proj",
        )(value)
        value = value.reshape(B, Lv, nh, self.d_model // nh)
        offsets = nn.Dense(
            nh * nl * npts * 2, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=_sampling_offset_bias_init(nh, nl, npts),
            name="sampling_offsets",
        )(query).reshape(B, Lq, nh, nl, npts, 2)
        weights = nn.Dense(
            nh * nl * npts, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="attention_weights",
        )(query).reshape(B, Lq, nh, nl * npts)
        weights = jax.nn.softmax(weights, axis=-1).reshape(B, Lq, nh, nl, npts)
        num_coords = refer_bbox.shape[-1]
        if num_coords == 2:
            normalizer = jnp.asarray([[w, h] for (h, w) in value_shapes], offsets.dtype)
            add = offsets / normalizer[None, None, None, :, None, :]
            locations = refer_bbox[:, :, None, :, None, :] + add
        elif num_coords == 4:
            add = offsets / npts * refer_bbox[:, :, None, :, None, 2:] * 0.5
            locations = refer_bbox[:, :, None, :, None, :2] + add
        else:
            raise ValueError(f"Last dim of refer_bbox must be 2 or 4, got {num_coords}")
        out = ms_deformable_attention(value, value_shapes, locations, weights)
        return nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name="output_proj",
        )(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference: transformer.py:312)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = MultiheadAttention(self.d_model, self.n_heads, dtype=self.dtype, name="self_attn")(
            q, k, embed, attn_mask=attn_mask
        )
        embed = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(embed + tgt)
        tgt = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points, dtype=self.dtype,
                           name="cross_attn")(
            embed if query_pos is None else embed + query_pos, refer_bbox[:, :, None], feats, shapes
        )
        embed = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(embed + tgt)
        tgt2 = nn.Dense(self.d_ffn, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(embed)
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(jax.nn.relu(tgt2))
        return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(embed + tgt2)


class TransformerLayer(nn.Module):
    """LayerNorm-free transformer layer (reference: transformer.py:118):
    separate q/k/v projections feeding packed MHA, residual 2-layer MLP."""

    c: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dense = lambda name: nn.Dense(self.c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)
        x = MultiheadAttention(self.c, self.num_heads, dtype=self.dtype, name="ma")(q, k, v) + x
        return dense("fc2")(dense("fc1")(x)) + x


class TransformerBlock(nn.Module):
    """ViT-style block over flattened spatial tokens with a learnable linear
    position embedding (reference: transformer.py:137). Used by C3TR."""

    c1: int
    c2: int
    num_heads: int = 4
    num_layers: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.c1 != self.c2:
            from .conv import Conv

            x = Conv(self.c1, self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p)
        return p.reshape(b, h, w, self.c2)
