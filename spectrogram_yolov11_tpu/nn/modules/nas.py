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

    deploy=True switches to the re-parameterized single-conv form
    (conv3x3 with bias -> ReLU); `fuse_qarepvgg` / `models.nas.fuse_nas`
    produce its parameters from a trained 3-branch tree. XLA fuses
    elementwise chains but never folds PARALLEL convs, so this transform is
    a real serving win (one conv instead of two + BN + adds per block).
    """

    c1: int
    c2: int
    s: int = 1
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        if self.deploy:
            y = conv2d(x, self.c2, 3, self.s, 1, bias=True, dtype=self.dtype, name="reparam")
            return jax.nn.relu(y).astype(self.dtype or in_dt)
        y3 = conv2d(x, self.c2, 3, self.s, 1, dtype=self.dtype, name="branch_3x3")
        y3 = batch_norm(y3, train, name="branch_3x3_bn")
        y1 = conv2d(x, self.c2, 1, self.s, 0, dtype=self.dtype, name="branch_1x1")
        y = y3 + y1
        if self.c1 == self.c2 and self.s == 1:
            y = y + x.astype(y.dtype)
        y = batch_norm(y, train, name="post_bn")
        return jax.nn.relu(y).astype(self.dtype or in_dt)


def fuse_qarepvgg(params: dict, stats: dict, eps: float = 1e-3):
    """Fold a trained QARepVGG subtree into (kernel (3,3,c1,c2), bias (c2,)).

    Exact algebra (the quantization-aware design guarantee): BN-scale the
    3x3 branch, center-pad the 1x1 branch, add the center identity when
    c1==c2 (in this architecture c1==c2 implies s==1 — every channel-
    preserving block is stride-1), then fold post_bn's affine into both.
    """
    import numpy as np

    w3 = np.asarray(params["branch_3x3"]["kernel"], np.float32)
    g3 = np.asarray(params["branch_3x3_bn"]["scale"], np.float32)
    be3 = np.asarray(params["branch_3x3_bn"]["bias"], np.float32)
    mu3 = np.asarray(stats["branch_3x3_bn"]["mean"], np.float32)
    var3 = np.asarray(stats["branch_3x3_bn"]["var"], np.float32)
    s3 = g3 / np.sqrt(var3 + eps)
    w = w3 * s3
    b = be3 - mu3 * s3
    w1 = np.asarray(params["branch_1x1"]["kernel"], np.float32)  # (1,1,c1,c2)
    w[1:2, 1:2] += w1
    c1, c2 = w.shape[2], w.shape[3]
    if c1 == c2:  # identity branch was live (s==1 for all c1==c2 blocks)
        w[1, 1] += np.eye(c1, dtype=np.float32)
    gp = np.asarray(params["post_bn"]["scale"], np.float32)
    bp = np.asarray(params["post_bn"]["bias"], np.float32)
    mup = np.asarray(stats["post_bn"]["mean"], np.float32)
    varp = np.asarray(stats["post_bn"]["var"], np.float32)
    sp = gp / np.sqrt(varp + eps)
    return w * sp, (b - mup) * sp + bp


class NASBottleneck(nn.Module):
    """Two QARepVGG convs with a learnable-alpha residual
    (super-gradients YoloNASBottleneck, use_alpha=True)."""

    c1: int
    c2: int
    shortcut: bool = True
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = QARepVGG(self.c1, self.c2, 1, deploy=self.deploy, dtype=self.dtype, name="cv1")(x, train)
        y = QARepVGG(self.c2, self.c2, 1, deploy=self.deploy, dtype=self.dtype, name="cv2")(y, train)
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
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(self.c1, c_, 1, 1, act="relu", dtype=self.dtype, name="conv1")(x, train)
        y2 = Conv(self.c1, c_, 1, 1, act="relu", dtype=self.dtype, name="conv2")(x, train)
        for i in range(self.n):
            y1 = NASBottleneck(c_, c_, deploy=self.deploy, dtype=self.dtype, name=f"bottlenecks_{i}")(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv(2 * c_, self.c2, 1, 1, act="relu", dtype=self.dtype, name="conv3")(y, train)


class NASStage(nn.Module):
    """Backbone stage: QARepVGG stride-2 downsample + NASCSP blocks
    (super-gradients YoloNASStage)."""

    c1: int
    c2: int
    n: int = 1
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = QARepVGG(self.c1, self.c2, 2, deploy=self.deploy, dtype=self.dtype, name="downsample")(x, train)
        return NASCSP(self.c2, self.c2, self.n, deploy=self.deploy, dtype=self.dtype, name="blocks")(x, train)


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
