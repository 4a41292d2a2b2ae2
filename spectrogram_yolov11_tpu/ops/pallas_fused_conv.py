"""Pallas TPU kernel: fused conv3x3+SiLU -> conv3x3+SiLU -> +residual
Bottleneck with full per-image VMEM residency (no HBM round trip for the
intermediate activation).

This closes the round-3 question "would VMEM-resident fused conv chains
beat the measured HBM roofline?" — measured answer: **no, on this
backend**. At the representative yolo11n layer-6 bottleneck shape
(40x40x128 bf16, bs128, BN folded, scan-fenced on the real v5e chip):

    XLA two-conv lowering:            12.1 us/img
    this kernel (9-tap matmul form):  13.1 us/img   (0.92x)
    im2col (1600,1152) matmul form:   14.0 us/img   (0.85x)

The arithmetic: fusing saves one intermediate write+read (0.41 MB/img,
~1 us at ~820 GB/s) but XLA's conv emitter sustains 68-118 bf16 TFLOP/s on
these shapes (ROUND3_NOTES int8 probe) and overlaps that traffic with
compute, while the hand-built matmul pipeline pays VMEM shuffle overhead
(halo padding + 9 shifted slices per conv) that exceeds the saving. Same
"don't hand-schedule what the compiler already does" lesson as
ops/pallas_nms.py, measured at the other end of the op spectrum. The
production forward therefore stays on XLA convs and sits at the HBM
roofline established in bench.py (0.147 ms/img bare forward ~= 120 MB/img
true traffic at ~820 GB/s).

Kernel form kept here: one grid step per image; scratch (H+2, W+2, C)
zero-padded halo; each conv = 9 accumulating (H*W, C) @ (C, C) MXU matmuls
(K=C=128 -> full MXU tiles); f32 accumulate; SiLU fused in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(v):
    return v * jax.nn.sigmoid(v)


def _conv_acc(xp, w_ref, h: int, w: int, c: int):
    """3x3 VALID conv over the padded (h+2, w+2, c) VMEM tile as 9
    accumulating full-tile matmuls."""
    acc = jnp.zeros((h * w, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tile = xp[ky : ky + h, kx : kx + w, :].reshape(h * w, c)
            acc = acc + jnp.dot(tile, w_ref[ky * 3 + kx], preferred_element_type=jnp.float32)
    return acc


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, xp, *, h, w, c):
    xi = x_ref[0]
    zeros = jnp.zeros((h + 2, w + 2, c), xi.dtype)
    xp[:] = zeros
    xp[1 : h + 1, 1 : w + 1, :] = xi
    y1 = _silu(_conv_acc(xp, w1_ref, h, w, c) + b1_ref[:]).astype(xi.dtype)
    xp[:] = zeros
    xp[1 : h + 1, 1 : w + 1, :] = y1.reshape(h, w, c)
    y2 = _silu(_conv_acc(xp, w2_ref, h, w, c) + b2_ref[:])
    o_ref[0] = y2.astype(xi.dtype).reshape(h, w, c) + xi


def fused_bottleneck(
    x: jax.Array,  # (B, H, W, C)
    w1: jax.Array,  # (3, 3, C, C) HWIO, BN folded
    b1: jax.Array,  # (C,) f32
    w2: jax.Array,
    b2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """silu(conv3x3(silu(conv3x3(x)+b1))+b2) + x with one VMEM-resident pass
    per image. C must be a multiple of 128 (lane width)."""
    bsz, h, w, c = x.shape
    kernel = functools.partial(_bottleneck_kernel, h=h, w=w, c=c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), x.dtype)],
        interpret=interpret,
    )(x, w1.reshape(9, c, c), b1, w2.reshape(9, c, c), b2)


def xla_bottleneck(x, w1, b1, w2, b2):
    """The XLA lowering of the same chain (the production form)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    y = _silu(y + b1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    return _silu(y + b2).astype(x.dtype) + x
