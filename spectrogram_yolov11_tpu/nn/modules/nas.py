"""YOLO-NAS architecture blocks, implemented natively.

The reference's NAS support (/root/reference/ultralytics/models/nas/model.py:53)
is a thin wrapper that imports `super_gradients` at runtime and downloads
pretrained torch checkpoints — neither is available in this zero-egress TPU
build, and a torch runtime dependency would defeat the point of the rebuild.
Instead the architecture itself is implemented here from its published design
(Deci's YOLO-NAS: QARepVGG quantization-aware re-parameterizable blocks
["Make RepVGG Greater Again", arXiv:2212.01593] arranged in CSP stages with a
PAN neck using transposed-conv upsampling), so `NAS('yolo_nas_s')` builds a
real trainable model in this framework rather than erroring.

Design notes (TPU-first):
- every activation is ReLU (the NAS search space's choice), baked into the
  blocks so the YAML graph stays positional-args-only;
- QARepVGG keeps its three branches at train time (3x3 conv+BN, bias-free
  1x1 conv, identity) summed BEFORE one shared post-BN — the
  quantization-aware trick that makes deploy-time folding exact. XLA fuses
  the branch adds into the conv epilogue under jit, so unlike torch there is
  no speed cliff that forces an explicit re-parameterization pass; the
  algebraic foldability is still verified by tests/test_nas.py, which folds
  the branches into a single dense 3x3 kernel and matches eval outputs.
- the learnable bottleneck residual scale (`alpha`, super-gradients'
  use_alpha) is a scalar f32 param so it survives bf16 compute casts.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv import Conv, ConvTranspose, batch_norm, conv2d

Dtype = Any


class QARepVGG(nn.Module):
    """Quantization-aware RepVGG block (QARepVGG paper fig. 4 "S4").

    y = ReLU(postBN(conv3x3+BN(x) + conv1x1(x) [+ x]))
    The identity branch exists only when shapes allow (c1==c2, s==1).
    """

    c1: int
    c2: int
    s: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        y3 = conv2d(x, self.c2, 3, self.s, 1, dtype=self.dtype, name="branch_3x3")
        y3 = batch_norm(y3, train, name="branch_3x3_bn")
        y1 = conv2d(x, self.c2, 1, self.s, 0, dtype=self.dtype, name="branch_1x1")
        y = y3 + y1
        if self.c1 == self.c2 and self.s == 1:
            y = y + x.astype(y.dtype)
        y = batch_norm(y, train, name="post_bn")
        return jax.nn.relu(y).astype(self.dtype or in_dt)


class NASBottleneck(nn.Module):
    """Two QARepVGG convs with a learnable-alpha residual
    (super-gradients YoloNASBottleneck, use_alpha=True)."""

    c1: int
    c2: int
    shortcut: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = QARepVGG(self.c1, self.c2, 1, dtype=self.dtype, name="cv1")(x, train)
        y = QARepVGG(self.c2, self.c2, 1, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and self.c1 == self.c2:
            alpha = self.param("alpha", nn.initializers.ones, (), jnp.float32)
            y = x + alpha.astype(y.dtype) * y
        return y


class NASCSP(nn.Module):
    """CSP layer over NASBottlenecks (super-gradients YoloNASCSPLayer):
    two 1x1 ReLU convs split the stream, n bottlenecks transform one half,
    concat + 1x1 ReLU conv merge."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(self.c1, c_, 1, 1, act="relu", dtype=self.dtype, name="conv1")(x, train)
        y2 = Conv(self.c1, c_, 1, 1, act="relu", dtype=self.dtype, name="conv2")(x, train)
        for i in range(self.n):
            y1 = NASBottleneck(c_, c_, dtype=self.dtype, name=f"bottlenecks_{i}")(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv(2 * c_, self.c2, 1, 1, act="relu", dtype=self.dtype, name="conv3")(y, train)


class NASStage(nn.Module):
    """Backbone stage: QARepVGG stride-2 downsample + NASCSP blocks
    (super-gradients YoloNASStage)."""

    c1: int
    c2: int
    n: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = QARepVGG(self.c1, self.c2, 2, dtype=self.dtype, name="downsample")(x, train)
        return NASCSP(self.c2, self.c2, self.n, dtype=self.dtype, name="blocks")(x, train)


class NASReduce(nn.Module):
    """1x1 conv+BN+ReLU channel reduction (the neck's reduce_skip / conv)."""

    c1: int
    c2: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(self.c1, self.c2, 1, 1, act="relu", dtype=self.dtype, name="conv")(x, train)


class NASDown(nn.Module):
    """3x3 stride-2 conv+BN+ReLU (the neck's downsample)."""

    c1: int
    c2: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(self.c1, self.c2, 3, 2, act="relu", dtype=self.dtype, name="conv")(x, train)


class NASUpsample(nn.Module):
    """2x transposed-conv upsample (k2 s2) — YOLO-NAS upsamples with a
    learned ConvTranspose2d, not nearest-neighbor like the YOLO family."""

    c1: int
    c2: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvTranspose(self.c1, self.c2, 2, 2, bn=True, act="relu", dtype=self.dtype, name="up")(x, train)
