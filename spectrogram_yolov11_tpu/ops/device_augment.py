"""On-device (TPU) train-time image augmentation.

The reference runs its whole augmentation pipeline on host CPU with cv2
(/root/reference/ultralytics/data/augment.py: Mosaic:490,
RandomPerspective:952, RandomHSV:1303, RandomFlip:1383), which we measured at
~50 ms/img on this host (`bench.py --data`) — i.e. ~50 CPU cores would be
needed to feed ONE chip at the measured 1037 img/s train rate. This module
moves the *image* half of that pipeline onto the TPU as one jitted program
that fuses into the train step; the host keeps only image decode + long-side
resize (~11 ms/img) and the label math (microseconds — a few dozen boxes).

Key identity that makes one fixed-shape program cover every case: the mosaic
canvas is initialized to 114 and cv2's warp border is also constant 114, so
"uncovered canvas" and "outside canvas" sample identically. The device
therefore never materializes the 2s x 2s canvas at all — each output pixel is
inverse-warped to canvas coordinates and each of its 4 bilinear neighbors is
resolved directly against the (up to 4) mosaic tile rectangles:

    out[y, x] = bilerp(canvas, A @ (x, y, 1))          A = M^-1 @ F_flip
    canvas(xi, yi) = src[t][yi - padh_t, xi - padw_t]  if (xi, yi) in tile t
                   = 114                               otherwise

The non-mosaic (letterboxed / close_mosaic) path is the same program with one
tile covering [0, s)^2 — identical shapes, so closing mosaic does not even
recompile. Flips are folded into A as index reflections; HSV jitter is applied
after the warp with cv2's uint8 semantics (BGR2HSV -> per-channel LUT ->
HSV2BGR, reference augment.py:1346-1380) so the result matches the host
pipeline to interpolation rounding.

Two device implementations share that math:

- **separable fast path** (``separable=True``): when degrees = shear =
  perspective = 0 — the reference's own default hyps — A is axis-aligned, so
  the resample factors into two 1-D interpolation operators. Those operators
  ARE sparse matrices, and applying them densely on the MXU beats gathering:
  out = sum_t W_y,t @ src_t @ W_x,t^T + 114*(1 - coverage), measured 0.533
  ms/img standalone at bs128 @640 with Dekker-split (f32-exact) bf16
  operands, vs 0.922 for the earlier 1-D-gather where-chain (kept as
  `_augment_one_separable_gather` for the exactness oracle). A raw-bf16
  variant measured 0.299 but its tap-weight rounding failed the cv2 parity
  gate once HSV amplified it; see `_augment_one_separable`.
- **general path** (``separable=False``): arbitrary affine/perspective warps
  via per-pixel flat gathers. Correct for any M, but 2-D gathers over a
  1.6M-row table are hostile to the TPU's DMA engines: measured ~300 ms/img.
  It exists for completeness (non-zero degrees/shear/perspective); production
  training with such hyps should prefer host augmentation.

The trainer picks the path statically from the hyps
(``BaseTrainer._aug_separable``), so the fast program compiles whenever the
defaults are in play.

Host-side parameter construction lives in data/augment.py
(TrainTransform(device_mode=True)); label geometry there is bit-identical to
the host pipeline because both modes run the SAME label code with the SAME
rng draw order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _canvas_sample(flat_src: jnp.ndarray, regions: jnp.ndarray, pads: jnp.ndarray,
                   s: int, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """Composite-canvas lookup at integer coords (H, W) -> (H, W, 3) float32.

    regions: (4, 4) int32 [x1a, y1a, x2a, y2a) canvas rects (zero-area = unused
    tile); pads: (4, 2) int32 (padw, padh) canvas->source offsets. Anything not
    covered by a tile — including outside the canvas — is the 114 fill.
    """
    inside = (
        (xi[None] >= regions[:, 0, None, None])
        & (xi[None] < regions[:, 2, None, None])
        & (yi[None] >= regions[:, 1, None, None])
        & (yi[None] < regions[:, 3, None, None])
    )  # (4, H, W)
    any_in = jnp.any(inside, axis=0)
    tid = jnp.argmax(inside, axis=0).astype(jnp.int32)  # (H, W)
    sx = jnp.clip(xi - pads[tid, 0], 0, s - 1)
    sy = jnp.clip(yi - pads[tid, 1], 0, s - 1)
    idx = (tid * s + sy) * s + sx  # flat index into (4*s*s, 3)
    val = jnp.take(flat_src, idx.reshape(-1), axis=0).reshape(*xi.shape, 3)
    return jnp.where(any_in[..., None], val.astype(jnp.float32), 114.0)


def _hsv_jitter_u8(img_bgr: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """cv2-faithful uint8 HSV gain jitter on a (H, W, 3) BGR image of rounded
    floats in [0, 255]. r = (r_h, r_s, r_v) multiplicative gains (reference
    augment.py:1346: BGR2HSV -> uint8 LUTs -> HSV2BGR).

    Reproduces cv2's 8-bit conversions in float: H stored as round(deg/2) in
    [0, 180), S = round(255*(V-min)/V), V = max; LUTs truncate (astype) after
    scaling, hue wraps mod 180.
    """
    b, g, rr = img_bgr[..., 0], img_bgr[..., 1], img_bgr[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), rr)
    mn = jnp.minimum(jnp.minimum(b, g), rr)
    diff = v - mn
    safe_v = jnp.maximum(v, 1.0)
    safe_d = jnp.maximum(diff, 1.0)
    s_ = jnp.where(v > 0, jnp.round(255.0 * diff / safe_v), 0.0)
    # tie order matches cv2: V==R first, then V==G (imgproc color_hsv 8u path)
    h_deg = jnp.where(
        v == rr, 60.0 * (g - b) / safe_d,
        jnp.where(v == g, 120.0 + 60.0 * (b - rr) / safe_d, 240.0 + 60.0 * (rr - g) / safe_d),
    )
    h_deg = jnp.where(h_deg < 0, h_deg + 360.0, h_deg)
    h_ = jnp.where(diff == 0, 0.0, jnp.round(h_deg / 2.0))
    # LUT stage: lut_hue = trunc((x*r0) % 180); lut_sat/val = trunc(clip(x*r, 0, 255))
    h2 = jnp.floor(jnp.mod(h_ * r[0], 180.0))
    s2 = jnp.floor(jnp.clip(s_ * r[1], 0.0, 255.0))
    v2 = jnp.floor(jnp.clip(v * r[2], 0.0, 255.0))
    # HSV2BGR (8-bit): sector of 30 hue units (= 60 degrees)
    h30 = h2 / 30.0
    sector = jnp.floor(h30)
    f = h30 - sector
    sec = jnp.mod(sector, 6.0).astype(jnp.int32)
    sf = s2 / 255.0
    p = v2 * (1.0 - sf)
    q = v2 * (1.0 - sf * f)
    t = v2 * (1.0 - sf * (1.0 - f))
    # per-sector (r, g, b) selection
    r_out = jnp.select([sec == 0, sec == 1, sec == 2, sec == 3, sec == 4], [v2, q, p, p, t], v2)
    g_out = jnp.select([sec == 0, sec == 1, sec == 2, sec == 3, sec == 4], [t, v2, v2, q, p], p)
    b_out = jnp.select([sec == 0, sec == 1, sec == 2, sec == 3, sec == 4], [p, p, t, v2, v2], q)
    out = jnp.stack([b_out, g_out, r_out], axis=-1)
    return jnp.round(jnp.clip(out, 0.0, 255.0))


def _augment_one(src: jnp.ndarray, regions: jnp.ndarray, pads: jnp.ndarray,
                 inv: jnp.ndarray, hsv_r: jnp.ndarray) -> jnp.ndarray:
    """One sample: (4, s, s, 3) u8 tiles -> (s, s, 3) f32 RGB in [0, 255]."""
    s = src.shape[1]
    flat_src = src.reshape(4 * s * s, 3)
    xg = jnp.arange(s, dtype=jnp.float32)
    X = jnp.broadcast_to(xg[None, :], (s, s))
    Y = jnp.broadcast_to(xg[:, None], (s, s))
    u = inv[0, 0] * X + inv[0, 1] * Y + inv[0, 2]
    v = inv[1, 0] * X + inv[1, 1] * Y + inv[1, 2]
    w = inv[2, 0] * X + inv[2, 1] * Y + inv[2, 2]
    u = u / w
    v = v / w
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = (u - x0f)[..., None]
    fy = (v - y0f)[..., None]
    # keep int coords bounded: anything far outside is 114 regardless
    x0 = jnp.clip(x0f, -2, 2 * s + 2).astype(jnp.int32)
    y0 = jnp.clip(y0f, -2, 2 * s + 2).astype(jnp.int32)
    c00 = _canvas_sample(flat_src, regions, pads, s, x0, y0)
    c10 = _canvas_sample(flat_src, regions, pads, s, x0 + 1, y0)
    c01 = _canvas_sample(flat_src, regions, pads, s, x0, y0 + 1)
    c11 = _canvas_sample(flat_src, regions, pads, s, x0 + 1, y0 + 1)
    bil = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy
    warped = jnp.round(jnp.clip(bil, 0.0, 255.0))  # cv2 rounds warp output to u8
    out_bgr = _hsv_jitter_u8(warped, hsv_r)
    return out_bgr[..., ::-1]  # BGR -> RGB (Format step, reference augment.py:1926)


def _axis_weights(inv_a: jnp.ndarray, inv_b: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                  pad: jnp.ndarray, s: int) -> jnp.ndarray:
    """1-D bilinear interpolation matrix for one axis of one tile.

    Canvas coordinate of output index o is u(o) = inv_a*o + inv_b; its two
    taps sit at floor(u), floor(u)+1 with weights (1-f, f). A tap contributes
    iff its canvas coord lies in the tile's [lo, hi) range; the source index
    is tap - pad (always in-range then — the host clips tile rects to their
    source extents). Returns (s_out, s_src) f32 with <= 2 nonzeros per row.
    """
    o = jnp.arange(s, dtype=jnp.float32)
    u = inv_a * o + inv_b
    x0 = jnp.floor(u)
    f = u - x0
    x0i = x0.astype(jnp.int32)
    src_idx = jnp.arange(s, dtype=jnp.int32)
    W = jnp.zeros((s, s), jnp.float32)
    for j, w in ((0, 1.0 - f), (1, f)):
        xi = x0i + j
        ok = (xi >= lo) & (xi < hi)
        sx = xi - pad
        W = W + jnp.where(ok[:, None], (sx[:, None] == src_idx[None, :]) * w[:, None], 0.0)
    return W


def _augment_one_separable(src: jnp.ndarray, regions: jnp.ndarray, pads: jnp.ndarray,
                           inv: jnp.ndarray, hsv_r: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned warp (inv[0,1] = inv[1,0] = 0, affine) as MXU matmuls.

    The separable bilinear resample IS a pair of sparse matrices: out =
    sum_t W_y,t @ src_t @ W_x,t^T + 114*(1 - sum_t rowsum(W_y,t) (x)
    rowsum(W_x,t)), where W_*,t are (s_out, s_src) 2-tap interpolation
    matrices with the tile's canvas-rect membership folded in (zero rows
    where a tap misses the tile; the uncovered remainder is the 114 fill,
    and rowsums give its per-pixel weight exactly). Applying them DENSELY
    wastes ~s/2 of the FLOPs — and still wins by 1.7x, because MXU FLOPs
    are nearly free while gathers are not: measured 0.533 ms/img vs 0.922
    for the 1-D-gather where-chain this replaces (bs128 @640, scan-fenced
    on a v5e; the gather variant is kept below for the exactness oracle).

    Precision: the MXU wants bf16 operands, but raw-bf16 tap weights round
    to ~2^-9 and the +-2 gray levels that introduces get amplified by the
    HSV hue quantization into >1% of pixels off by >3 vs the host cv2
    pipeline (measured; a raw-bf16 variant ran 0.299 ms/img but failed the
    parity gate). So each operand is Dekker-split into hi + lo bf16 halves
    (hi = bf16(x), lo = bf16(x - hi)): stage 1 sums two einsums against the
    exact-in-bf16 u8 source, stage 2 sums three (dropping the tiny lo*lo
    term), recovering exact bilinear to ~1e-2 gray levels (f32-accumulation
    noise). >99.5% of pixels round identically to the gather oracle; the
    rest sit within ~1e-2 of a .5 boundary and flip by +-1 (measured
    0.15-0.45%/image; tests/test_device_augment.py bounds it).
    """
    s = src.shape[1]
    Wx = jnp.stack([_axis_weights(inv[0, 0], inv[0, 2], regions[t, 0], regions[t, 2],
                                  pads[t, 0], s) for t in range(4)])
    Wy = jnp.stack([_axis_weights(inv[1, 1], inv[1, 2], regions[t, 1], regions[t, 3],
                                  pads[t, 1], s) for t in range(4)])
    st = src.astype(jnp.bfloat16)  # (4, s, s, 3); u8 values are exact in bf16
    Wy_hi = Wy.astype(jnp.bfloat16)
    Wy_lo = (Wy - Wy_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    Wx_hi = Wx.astype(jnp.bfloat16)
    Wx_lo = (Wx - Wx_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    B = (jnp.einsum("tos,tsxc->toxc", Wy_hi, st, preferred_element_type=jnp.float32)
         + jnp.einsum("tos,tsxc->toxc", Wy_lo, st, preferred_element_type=jnp.float32))
    B_hi = B.astype(jnp.bfloat16)
    B_lo = (B - B_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("toxc,tpx->opc", B_hi, Wx_hi, preferred_element_type=jnp.float32)
           + jnp.einsum("toxc,tpx->opc", B_hi, Wx_lo, preferred_element_type=jnp.float32)
           + jnp.einsum("toxc,tpx->opc", B_lo, Wx_hi, preferred_element_type=jnp.float32))
    cover = jnp.einsum("to,tp->op", Wy.sum(2), Wx.sum(2))
    bil = out + 114.0 * (1.0 - cover)[..., None]
    warped = jnp.round(jnp.clip(bil, 0.0, 255.0))
    out_bgr = _hsv_jitter_u8(warped, hsv_r)
    return out_bgr[..., ::-1]


def _augment_one_separable_gather(src: jnp.ndarray, regions: jnp.ndarray, pads: jnp.ndarray,
                                  inv: jnp.ndarray, hsv_r: jnp.ndarray) -> jnp.ndarray:
    """Gather formulation of the separable warp (the pre-matmul production
    path, kept as the exact-f32 oracle for tests): each bilinear tap is two
    1-D *axis* gathers (``jnp.take`` of whole rows/columns) and the tile
    membership test factors into an outer product of 1-D masks. Numerically
    identical to _augment_one on separable inputs; measured 0.922 ms/img at
    bs128 @640 vs 0.299 for the matmul path above."""
    s = src.shape[1]
    x = jnp.arange(s, dtype=jnp.float32)
    u = inv[0, 0] * x + inv[0, 2]  # canvas x per output column (s,)
    v = inv[1, 1] * x + inv[1, 2]  # canvas y per output row (s,)
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = (u - x0f)[None, :, None]
    fy = (v - y0f)[:, None, None]
    x0 = jnp.clip(x0f, -2, 2 * s + 2).astype(jnp.int32)
    y0 = jnp.clip(y0f, -2, 2 * s + 2).astype(jnp.int32)

    def composite(xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
        """Canvas lookup at the (yi x xi) integer grid -> (s, s, 3) uint8.
        Reverse where-chain == the general path's argmax (first tile wins).
        Stays uint8 throughout: TPU gathers don't fuse into elementwise
        kernels, so every tap's gather output round-trips HBM — keeping it
        u8 (not f32) is 4x less traffic; the f32 cast happens fused inside
        the bilinear-mix kernel."""
        out = jnp.full((s, s, 3), 114, jnp.uint8)
        for i in range(3, -1, -1):
            in_x = (xi >= regions[i, 0]) & (xi < regions[i, 2])  # (s,)
            in_y = (yi >= regions[i, 1]) & (yi < regions[i, 3])  # (s,)
            sx = jnp.clip(xi - pads[i, 0], 0, s - 1)
            sy = jnp.clip(yi - pads[i, 1], 0, s - 1)
            val = jnp.take(jnp.take(src[i], sy, axis=0), sx, axis=1)
            m = (in_y[:, None] & in_x[None, :])[..., None]
            out = jnp.where(m, val, out)
        return out

    c00 = composite(x0, y0).astype(jnp.float32)
    c10 = composite(x0 + 1, y0).astype(jnp.float32)
    c01 = composite(x0, y0 + 1).astype(jnp.float32)
    c11 = composite(x0 + 1, y0 + 1).astype(jnp.float32)
    bil = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy
    warped = jnp.round(jnp.clip(bil, 0.0, 255.0))
    out_bgr = _hsv_jitter_u8(warped, hsv_r)
    return out_bgr[..., ::-1]


def augment_batch(src: jnp.ndarray, regions: jnp.ndarray, pads: jnp.ndarray,
                  inv: jnp.ndarray, hsv_r: jnp.ndarray, separable: bool = False) -> jnp.ndarray:
    """Batched device augmentation.

    src:     (B, 4, s, s, 3) uint8 BGR mosaic tiles (unused tiles arbitrary)
    regions: (B, 4, 4) int32 canvas rects [x1a, y1a, x2a, y2a)
    pads:    (B, 4, 2) int32 (padw, padh) canvas->source offsets
    inv:     (B, 3, 3) float32 output-index -> canvas-coord matrices
             (M^-1 with flips folded in; last row (0,0,1) when affine)
    hsv_r:   (B, 3) float32 HSV multiplicative gains
    separable: static flag — True only when every inv is axis-aligned
             (degrees = shear = perspective = 0, i.e. the default hyps);
             selects the TPU-fast MXU-matmul implementation (0.533 ms/img
             standalone vs ~300 ms/img for the general flat-gather path at
             640px bs128).

    Returns (B, s, s, 3) float32 RGB images in [0, 255], rounded to integer
    values (bit-compatible with the host uint8 pipeline up to interpolation
    rounding). Call inside jit — it fuses into the training program.
    """
    fn = _augment_one_separable if separable else _augment_one
    return jax.vmap(fn)(src, regions, pads, inv, hsv_r)
