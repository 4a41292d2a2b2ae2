"""SAM (Segment Anything) core: ViT image encoder + prompt encoder + mask
decoder, flax/NHWC, plus a promptable predictor and the `SAM` facade.

Counterpart of /root/reference/ultralytics/models/sam/ (modules/encoders.py:23
ImageEncoderViT, :165 PromptEncoder; modules/blocks.py:877 Block, :979
REAttention, :813 PositionEmbeddingRandom, :1073 PatchEmbed;
modules/decoders.py:11 MaskDecoder; modules/transformer.py:12
TwoWayTransformer; predict.py:37 Predictor; model.py SAM facade).

Scope: the SAM1 image pipeline — encoder, prompt/mask decoder, point/box
prompting, and segment-everything generate() — with parity tests against the
torch reference on converted weights. SAM2 (Hiera + memory attention + video)
lives in models/sam2.py.

TPU-first notes:
- NHWC everywhere; the decoder's token<->map reshapes are plain reshapes;
- prompt tensors are padded to a static max (points padded with label -1 =
  "not a point", exactly the reference's padding convention), so one jitted
  program serves any prompt count;
- windowed ViT attention partitions at trace time (static shapes).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectrogram_yolov11_tpu.nn.modules.conv import conv2d, conv_transpose2d
from spectrogram_yolov11_tpu.nn.modules.transformer import MLP, LayerNorm2d

Dtype = Any

_LN = dict(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32)


# ---------------------------------------------------------------------------
# image encoder (ViT)
# ---------------------------------------------------------------------------


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B*nw, ws, ws, C) with zero padding (reference utils.py:126)."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C), (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    """Inverse of window_partition (reference utils.py:158)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def get_rel_pos(q_size: int, k_size: int, rel_pos):
    """Relative positional embedding lookup (reference utils.py:196); static sizes."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """Decomposed rel-pos bias (reference utils.py:238). attn (B, qh*qw, kh*kw)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, q_h, q_w, k_h, k_w) + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


class REAttention(nn.Module):
    """ViT self-attention with optional decomposed rel-pos (reference blocks.py:979)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd).transpose(2, 0, 3, 1, 4).reshape(3, B * nh, H * W, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd**-0.5) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd), jnp.float32)
            attn = add_decomposed_rel_pos(attn, q, rel_h, rel_w, (H, W), (H, W))
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(B, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class PatchEmbed(nn.Module):
    """Conv patch embedding, NHWC out (reference blocks.py:1073; child named
    `proj` so torch `patch_embed.proj.*` keys translate)."""

    embed_dim: int
    patch_size: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv2d(x, self.embed_dim, self.patch_size, self.patch_size, 0, bias=True,
                      dtype=self.dtype, name="proj")


class _MLPBlock(nn.Module):
    """lin1 -> act -> lin2 (reference nn/modules/transformer.py:158 MLPBlock).
    ViT blocks use GELU; the two-way decoder blocks use ReLU (the reference
    TwoWayTransformer default activation, transformer.py:44)."""

    embedding_dim: int
    mlp_dim: int
    act: str = "gelu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="lin1")(x)
        h = jax.nn.gelu(h, approximate=False) if self.act == "gelu" else jax.nn.relu(h)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=jnp.float32, name="lin2")(h)


class ImageEncoderViT(nn.Module):
    """ViT-det image encoder (reference encoders.py:23). NHWC in/out:
    (B, img, img, 3) -> (B, img/16, img/16, out_chans)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    use_abs_pos: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    global_attn_indexes: Tuple[int, ...] = ()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        gp = self.img_size // self.patch_size
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed")(x)
        if self.use_abs_pos:
            # param sized to THIS model's grid (reference __init__ does the
            # same; its forward-time rescale only matters when running a
            # 1024-trained checkpoint at a different img_size — here weights
            # are resized at conversion time instead)
            pos = self.param("pos_embed", nn.initializers.zeros, (1, gp, gp, self.embed_dim), jnp.float32)
            x = x + pos
        for i in range(self.depth):
            x = _SAMViTBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.use_rel_pos,
                self.window_size if i not in self.global_attn_indexes else 0,
                (gp, gp), dtype=self.dtype, name=f"blocks_{i}",
            )(x)
        y = conv2d(x, self.out_chans, 1, bias=False, dtype=self.dtype, name="neck_0")
        y = LayerNorm2d(self.out_chans, name="neck_1")(y)
        y = conv2d(y, self.out_chans, 3, 1, 1, bias=False, dtype=self.dtype, name="neck_2")
        return LayerNorm2d(self.out_chans, name="neck_3")(y)


class _SAMViTBlock(nn.Module):
    """Block with torch-compatible child names (norm1/attn/norm2/mlp)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    use_rel_pos: bool
    window_size: int
    input_size: Tuple[int, int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(**_LN, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = REAttention(
            self.dim, self.num_heads, use_rel_pos=self.use_rel_pos,
            input_size=self.input_size if self.window_size == 0 else (self.window_size, self.window_size),
            dtype=self.dtype, name="attn",
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + _MLPBlock(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            nn.LayerNorm(**_LN, name="norm2")(x)
        )


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference blocks.py:813)."""

    num_pos_feats: int = 64

    def setup(self):
        self.gaussian_matrix = self.param("positional_encoding_gaussian_matrix", nn.initializers.normal(1.0),
                                          (2, self.num_pos_feats), jnp.float32)

    def _encode(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.gaussian_matrix
        coords = 2 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def __call__(self, size: Tuple[int, int]):
        """Grid encoding -> (H, W, 2*num_pos_feats)."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(y, x, indexing="ij")
        return self._encode(jnp.stack([xx, yy], -1))

    def with_coords(self, coords, image_size: Tuple[int, int]):
        c = coords / jnp.asarray([image_size[1], image_size[0]], jnp.float32)
        return self._encode(c)


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> sparse + dense embeddings (reference encoders.py:165).

    Static shapes: points (B, N, 2) with labels (B, N) where label -1 marks
    padding; boxes (B, NB, 4) with a validity mask folded into labels by the
    caller (each box becomes 2 corner points with labels 2/3).
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Optional[Dtype] = None

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}", nn.initializers.normal(1.0), (1, self.embed_dim), jnp.float32)
            for i in range(4)
        ]
        self.not_a_point_embed = self.param("not_a_point_embed", nn.initializers.normal(1.0),
                                            (1, self.embed_dim), jnp.float32)
        self.no_mask_embed = self.param("no_mask_embed", nn.initializers.normal(1.0),
                                        (1, self.embed_dim), jnp.float32)
        mc = self.mask_in_chans
        self.mask_downscaling_0 = nn.Conv(mc // 4, (2, 2), (2, 2), padding="VALID",
                                          dtype=self.dtype, param_dtype=jnp.float32)
        self.mask_downscaling_1 = LayerNorm2d(mc // 4)
        self.mask_downscaling_3 = nn.Conv(mc, (2, 2), (2, 2), padding="VALID",
                                          dtype=self.dtype, param_dtype=jnp.float32)
        self.mask_downscaling_4 = LayerNorm2d(mc)
        self.mask_downscaling_6 = nn.Conv(self.embed_dim, (1, 1), padding="VALID",
                                          dtype=self.dtype, param_dtype=jnp.float32)

    def get_dense_pe(self):
        return self.pe_layer(self.image_embedding_size)[None]  # (1, H, W, C)

    def _embed_points(self, points, labels):
        pts = points + 0.5
        pe = self.pe_layer.with_coords(pts, self.input_image_size)  # (B, N, C)
        lab = labels[..., None]
        out = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        for li in range(4):
            out = out + jnp.where(lab == li, self.point_embeddings[li][0], 0.0)
        return out

    def __call__(self, points=None, labels=None, boxes=None, masks=None, batch: int = 1):
        """Returns (sparse (B, N_sparse, C), dense (B, H, W, C))."""
        sparse_parts = []
        if points is not None:
            sparse_parts.append(self._embed_points(points, labels))
        if boxes is not None:
            corners = (boxes + 0.5).reshape(boxes.shape[0], -1, 2, 2)
            ce = self.pe_layer.with_coords(corners.reshape(boxes.shape[0], -1, 2), self.input_image_size)
            ce = ce.reshape(boxes.shape[0], -1, 2, self.embed_dim)
            ce = ce.at[:, :, 0].add(self.point_embeddings[2][0]).at[:, :, 1].add(self.point_embeddings[3][0])
            sparse_parts.append(ce.reshape(boxes.shape[0], -1, self.embed_dim))
        b = sparse_parts[0].shape[0] if sparse_parts else batch
        sparse = (jnp.concatenate(sparse_parts, axis=1) if sparse_parts
                  else jnp.zeros((b, 0, self.embed_dim), jnp.float32))
        h, w = self.image_embedding_size
        if masks is not None:
            m = self.mask_downscaling_0(masks)
            m = jax.nn.gelu(self.mask_downscaling_1(m), approximate=False)
            m = self.mask_downscaling_3(m)
            m = jax.nn.gelu(self.mask_downscaling_4(m), approximate=False)
            dense = self.mask_downscaling_6(m)
        else:
            dense = jnp.broadcast_to(self.no_mask_embed.reshape(1, 1, 1, -1), (b, h, w, self.embed_dim))
        return sparse, dense


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------


class SAMAttention(nn.Module):
    """Downsampled multi-head attention (reference transformer.py:265)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = internal // nh
        qp = nn.Dense(internal, dtype=self.dtype, param_dtype=jnp.float32, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, param_dtype=jnp.float32, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj")(v)
        B, Nq = qp.shape[:2]
        Nk = kp.shape[1]
        qh = qp.reshape(B, Nq, nh, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Nk, nh, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Nk, nh, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, Nq, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Sparse<->dense two-way attention block (reference transformer.py:152)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = SAMAttention(self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + SAMAttention(self.embedding_dim, self.num_heads, dtype=self.dtype,
                                             name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(**_LN, name="norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SAMAttention(self.embedding_dim, self.num_heads, self.attention_downsample_rate,
                                         dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(**_LN, name="norm2")(queries)
        queries = queries + _MLPBlock(self.embedding_dim, self.mlp_dim, act="relu", dtype=self.dtype, name="mlp")(queries)
        queries = nn.LayerNorm(**_LN, name="norm3")(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SAMAttention(self.embedding_dim, self.num_heads, self.attention_downsample_rate,
                                   dtype=self.dtype, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(**_LN, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Query<->image transformer (reference transformer.py:12)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe (B, H, W, C) NHWC; point_embedding (B, N, C)."""
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = image_pe.reshape(B, H * W, C) if image_pe.ndim == 4 else image_pe
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim, self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + SAMAttention(self.embedding_dim, self.num_heads, self.attention_downsample_rate,
                                         dtype=self.dtype, name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(**_LN, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """Masks + IoU scores from image/prompt embeddings (reference decoders.py:11)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings, dense_prompt_embeddings,
                 multimask_output: bool = False):
        """image_embeddings (1|B, H, W, C) NHWC; returns (masks (B, k, 4H, 4W), iou (B, k))."""
        td = self.transformer_dim
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, td), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (num_mask_tokens, td), jnp.float32)

        B = sparse_prompt_embeddings.shape[0]
        out_tokens = jnp.broadcast_to(jnp.concatenate([iou_token, mask_tokens], 0)[None],
                                      (B, 1 + num_mask_tokens, td))
        tokens = jnp.concatenate([out_tokens, sparse_prompt_embeddings], axis=1)
        src = jnp.broadcast_to(image_embeddings, (B, *image_embeddings.shape[1:])) + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe, (B, *image_pe.shape[1:]))
        _, h, w, c = src.shape

        hs, src = TwoWayTransformer(self.depth, td, self.num_heads, self.mlp_dim,
                                    dtype=self.dtype, name="transformer")(src, pos_src, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        src = src.reshape(B, h, w, c)
        up = conv_transpose2d(src, td // 4, 2, 2, dtype=self.dtype, name="output_upscaling_0")
        up = jax.nn.gelu(LayerNorm2d(td // 4, name="output_upscaling_1")(up), approximate=False)
        up = conv_transpose2d(up, td // 8, 2, 2, dtype=self.dtype, name="output_upscaling_3")
        up = jax.nn.gelu(up, approximate=False)  # (B, 4h, 4w, td//8)

        hyper = jnp.stack(
            [MLP(td, td, td // 8, 3, name=f"output_hypernetworks_mlps_{i}")(mask_tokens_out[:, i])
             for i in range(num_mask_tokens)], axis=1,
        )  # (B, k, td//8)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)
        iou_pred = MLP(td, self.iou_head_hidden_dim, num_mask_tokens, self.iou_head_depth,
                       name="iou_prediction_head")(iou_token_out)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]


# ---------------------------------------------------------------------------
# assembled model + predictor + facade
# ---------------------------------------------------------------------------

SAM_VARIANTS = {
    # embed_dim, depth, num_heads, global_attn_indexes (reference build.py)
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
    "mobile_sam": dict(tiny=True),  # TinyViT trunk (reference build.py:56)
}


def _build_image_encoder(variant: str, img_size: int, out_chans: int = 256, dtype=None, name=None):
    """Variant-dispatched SAM image encoder (reference build.py _build_sam).

    `name` is set when nesting inside SAMModel and omitted for the standalone
    jitted encoder (flax rejects names on top-level modules)."""
    cfg = SAM_VARIANTS[variant]
    if cfg.get("tiny"):
        from spectrogram_yolov11_tpu.models.tiny_encoder import TinyViT

        return TinyViT(img_size=img_size, dtype=dtype, name=name)
    return ImageEncoderViT(
        img_size=img_size, embed_dim=cfg["embed_dim"], depth=cfg["depth"],
        num_heads=cfg["num_heads"], global_attn_indexes=cfg["global_attn_indexes"],
        use_rel_pos=True, window_size=14, out_chans=out_chans, dtype=dtype, name=name,
    )


class SAMModel(nn.Module):
    """image_encoder + prompt_encoder + mask_decoder (reference modules/sam.py:27)."""

    variant: str = "vit_b"
    img_size: int = 1024
    prompt_embed_dim: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, image, points=None, labels=None, boxes=None, masks=None, multimask_output: bool = False):
        """image (B, img, img, 3) RGB normalized; prompt tensors static-padded."""
        emb_size = self.img_size // 16
        enc = _build_image_encoder(self.variant, self.img_size, self.prompt_embed_dim, self.dtype,
                                   name="image_encoder")
        pe = PromptEncoder(self.prompt_embed_dim, (emb_size, emb_size), (self.img_size, self.img_size),
                           16, dtype=self.dtype, name="prompt_encoder")
        dec = MaskDecoder(self.prompt_embed_dim, dtype=self.dtype, name="mask_decoder")
        image_embeddings = enc(image)
        sparse, dense = pe(points=points, labels=labels, boxes=boxes, masks=masks, batch=image.shape[0])
        image_pe = pe.get_dense_pe()
        return dec(image_embeddings, image_pe, sparse, dense, multimask_output=multimask_output)


class SAMPredictor:
    """Promptable segmentation predictor (reference sam/predict.py:37 Predictor).

    Scope: SAM1 image prompting — set_image once, then point/box prompts reuse
    the cached embedding. Pixel pipeline matches the reference: long-side
    resize to 1024, ImageNet-ish SAM mean/std normalization, zero pad.
    """

    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)

    def __init__(self, variant: str = "vit_b", img_size: int = 1024, variables=None, seed: int = 0):
        self.model = SAMModel(variant=variant, img_size=img_size)
        self.img_size = img_size
        self.variables = variables
        self._seed = seed
        self._image_state = None

    def _ensure_variables(self, image):
        if self.variables is None:
            self.variables = self.model.init(
                jax.random.PRNGKey(self._seed), image,
                points=jnp.zeros((1, 1, 2)), labels=jnp.full((1, 1), -1, jnp.int32),
                masks=jnp.zeros((1, self.img_size // 4, self.img_size // 4, 1)),
            )

    def preprocess(self, bgr: np.ndarray):
        h0, w0 = bgr.shape[:2]
        import cv2

        scale = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        im = cv2.resize(bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)[..., ::-1].astype(np.float32)
        im = (im - self.mean) / self.std
        canvas = np.zeros((self.img_size, self.img_size, 3), np.float32)
        canvas[:nh, :nw] = im
        return canvas[None], scale, (h0, w0)

    def set_image(self, bgr: np.ndarray) -> None:
        x, scale, orig = self.preprocess(bgr)
        x = jnp.asarray(x)
        self._ensure_variables(x)
        if not hasattr(self, "_enc_fn"):
            enc = _build_image_encoder(self.model.variant, self.img_size)
            self._enc_fn = jax.jit(lambda v, xx: enc.apply(v, xx))
        enc_vars = {"params": self.variables["params"]["image_encoder"]}
        if "batch_stats" in self.variables:  # TinyViT (mobile_sam) carries BN stats
            enc_vars["batch_stats"] = self.variables["batch_stats"]["image_encoder"]
        emb = self._enc_fn(enc_vars, x)
        self._image_state = (emb, scale, orig)

    def prompt(self, points=None, labels=None, boxes=None, multimask_output: bool = False):
        """Predict masks for prompts in ORIGINAL image pixel coords."""
        assert self._image_state is not None, "call set_image() first"
        emb, scale, (h0, w0) = self._image_state
        kw = {}
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.float32))[None] * scale
            lab = np.ones(pts.shape[:2], np.int32) if labels is None else np.atleast_2d(np.asarray(labels, np.int32))
            # reference pads a single not-a-point when no box prompt accompanies points
            if boxes is None:
                pts = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
                lab = np.concatenate([lab, -np.ones((1, 1), np.int32)], axis=1)
            kw.update(points=jnp.asarray(pts), labels=jnp.asarray(lab))
        if boxes is not None:
            kw["boxes"] = jnp.asarray(np.atleast_2d(np.asarray(boxes, np.float32))[None] * scale)
        pe_dim = self.model.prompt_embed_dim
        pe = PromptEncoder(pe_dim, (self.img_size // 16,) * 2, (self.img_size,) * 2, 16)
        sparse, dense = pe.apply({"params": self.variables["params"]["prompt_encoder"]},
                                 batch=1, method=PromptEncoder.__call__, **kw)
        image_pe = pe.apply({"params": self.variables["params"]["prompt_encoder"]}, method=PromptEncoder.get_dense_pe)
        dec = MaskDecoder(pe_dim)
        masks, iou = dec.apply({"params": self.variables["params"]["mask_decoder"]},
                               emb, image_pe, sparse, dense, multimask_output=multimask_output)
        # upsample to original resolution, strip padding (reference postprocess_masks)
        m = jax.image.resize(masks, (*masks.shape[:2], self.img_size, self.img_size), method="bilinear")
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        m = m[:, :, :nh, :nw]
        m = jax.image.resize(m, (*masks.shape[:2], h0, w0), method="bilinear")
        return np.asarray(m > 0.0), np.asarray(iou)

    def generate(self, bgr, crop_n_layers: int = 0, crop_overlap_ratio: float = 512 / 1500,
                      crop_downscale_factor: int = 1, point_grids=None, points_stride: int = 32,
                      points_batch_size: int = 64, conf_thres: float = 0.88,
                      stability_score_thresh: float = 0.95, stability_score_offset: float = 0.95,
                      iou_thres: float = 0.7, crop_nms_thresh: float = 0.7):
        """Segment everything: grid-prompt the whole image (+ optional crop layers)
        and keep confident, stable, deduplicated masks (reference predict.py:297).

        TPU-first: all prompt batches run through ONE jitted fixed-shape program
        (points_batch_size prompts at a time, each a single click + pad point);
        the variable-length filtering/NMS runs host-side in models/amg.py.

        Returns (masks (N, S, S) bool at model resolution, scores (N,),
        boxes (N, 4) xyxy at model resolution).
        """
        import cv2

        from spectrogram_yolov11_tpu.models import amg

        S = self.img_size
        im = cv2.resize(bgr, (S, S), interpolation=cv2.INTER_LINEAR)  # square, like reference preprocess
        crop_regions, layer_idxs = amg.generate_crop_boxes((S, S), crop_n_layers, crop_overlap_ratio)
        if point_grids is None:
            point_grids = amg.build_all_layer_point_grids(points_stride, crop_n_layers, crop_downscale_factor)

        if not hasattr(self, "_gen_fn"):
            pe_dim = self.model.prompt_embed_dim
            pe = PromptEncoder(pe_dim, (S // 16,) * 2, (S,) * 2, 16)
            dec = MaskDecoder(pe_dim)

            def gen_fn(params, emb, pts, lab):
                sparse, dense = pe.apply({"params": params["prompt_encoder"]}, points=pts, labels=lab,
                                         batch=pts.shape[0])
                image_pe = pe.apply({"params": params["prompt_encoder"]}, method=PromptEncoder.get_dense_pe)
                return dec.apply({"params": params["mask_decoder"]}, emb, image_pe, sparse, dense,
                                 multimask_output=True)

            self._gen_fn = jax.jit(gen_fn)

        all_masks, all_scores, all_boxes, region_areas = [], [], [], []
        for crop_box, layer_idx in zip(crop_regions, layer_idxs):
            x0, y0, x1, y1 = crop_box
            w, h = x1 - x0, y1 - y0
            crop = cv2.resize(im[y0:y1, x0:x1], (S, S), interpolation=cv2.INTER_LINEAR)
            self.set_image(crop)
            emb = self._image_state[0]
            pts_model = point_grids[layer_idx] * S  # the crop is resized to S x S

            crop_masks, crop_scores = [], []
            P = points_batch_size
            for (pts,) in amg.batch_iterator(P, pts_model):
                n = len(pts)
                if n < P:  # pad the final slice to the static batch
                    pts = np.concatenate([pts, np.zeros((P - n, 2), np.float32)])
                batch_pts = np.concatenate([pts[:, None], np.zeros((P, 1, 2), np.float32)], axis=1)
                batch_lab = np.concatenate([np.ones((P, 1), np.int32), -np.ones((P, 1), np.int32)], axis=1)
                masks, ious = self._gen_fn(self.variables["params"], emb,
                                           jnp.asarray(batch_pts), jnp.asarray(batch_lab))
                masks = np.asarray(masks[:n]).reshape(-1, masks.shape[-2], masks.shape[-1])
                ious = np.asarray(ious[:n]).reshape(-1)
                keep = ious > conf_thres
                masks, ious = masks[keep], ious[keep]
                stab = amg.calculate_stability_score(masks, 0.0, stability_score_offset)
                keep = stab > stability_score_thresh
                crop_masks.append(masks[keep] > 0.0)
                crop_scores.append(ious[keep])

            masks = np.concatenate(crop_masks) if crop_masks else np.zeros((0, S // 4, S // 4), bool)
            scores = np.concatenate(crop_scores) if crop_scores else np.zeros((0,), np.float32)
            # boxes live at crop resolution: mask grid (S/4) -> crop pixels
            boxes = amg.batched_mask_to_box(masks) * (np.array([w, h, w, h], np.float32) / (S / 4))
            edge = amg.is_box_near_crop_edge(boxes, crop_box, [0, 0, S, S])
            if edge.any() and len(crop_regions) > 1:
                masks, scores, boxes = masks[~edge], scores[~edge], boxes[~edge]
            if len(scores):
                keep = amg.greedy_nms(boxes, scores, iou_thres)
                masks, scores, boxes = masks[keep], scores[keep], boxes[keep]
            # uncrop to model-resolution full-image frame
            up = np.zeros((len(masks), S, S), bool)
            for i, m in enumerate(masks):
                up[i, y0:y1, x0:x1] = cv2.resize(m.astype(np.uint8), (w, h),
                                                 interpolation=cv2.INTER_NEAREST).astype(bool)
            all_masks.append(up)
            all_scores.append(scores)
            all_boxes.append(amg.uncrop_boxes_xyxy(boxes, crop_box))
            region_areas.append(np.full(len(scores), w * h, np.float32))

        masks = np.concatenate(all_masks)
        scores = np.concatenate(all_scores)
        boxes = np.concatenate(all_boxes)
        if len(crop_regions) > 1 and len(scores):
            keep = amg.greedy_nms(boxes, 1.0 / np.concatenate(region_areas), crop_nms_thresh)
            masks, scores, boxes = masks[keep], scores[keep], boxes[keep]
        return masks, scores, boxes


class SAM:
    """`SAM('sam_b.ckpt' | 'vit_b')` facade (reference sam/model.py:26).

    Weights: the reference downloads sam_b.pt; offline builds start from
    random init (or a converted checkpoint via utils/torch_compat)."""

    def __new__(cls, model: str = "vit_b"):
        name = str(model)
        variant = {"sam_b": "vit_b", "sam_l": "vit_l", "sam_h": "vit_h",
                   "mobile_sam": "mobile_sam"}.get(Path(name).stem, Path(name).stem)
        if variant not in SAM_VARIANTS:
            raise ValueError(f"unknown SAM variant {model!r}; options: {sorted(SAM_VARIANTS)}")
        return SAMPredictor(variant=variant)

