"""Convolution-family modules (flax.linen, NHWC layout).

TPU-native re-implementations of the conv module zoo of the reference
framework (/root/reference/ultralytics/nn/modules/conv.py). Semantics match
the torch originals exactly (explicit torch-style symmetric padding k//2, BN
eps=1e-3 / momentum 0.03, SiLU default activation) so that converted .pt
weights produce bit-comparable outputs; layout is NHWC and compute dtype is
configurable (bfloat16 on TPU) while parameters stay float32.

Submodule attribute names mirror the torch module names (cv1, conv, bn, ...)
so that torch state_dict keys translate mechanically (utils/torch_compat.py).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def autopad(k, p=None, d=1):
    """'same'-shape padding for odd kernels (reference: conv.py:56)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


ACTS: dict[str, Callable] = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "hardswish": jax.nn.hard_swish,
    "hardsigmoid": jax.nn.hard_sigmoid,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "identity": lambda x: x,
}


_DEFAULT_ACT = {"name": "silu"}


def resolve_act_name(name) -> Optional[str]:
    """Map an activation spec (our registry key or a torch spelling like
    'nn.ReLU()') to an ACTS key; None when unknown/empty."""
    if not name:
        return None
    key = str(name).lower().removeprefix("nn.").split("(")[0]
    return key if key in ACTS else None


def set_default_act(name: str) -> bool:
    """Override the graph-wide default activation (reference: parse_model
    evals the yaml 'activation:' key into Conv.default_act, nn/tasks.py:980 —
    a class-level global there; here YOLOGraph re-pins it at every trace so
    models with different defaults can interleave). Returns False (and
    leaves the default) for unknown names."""
    key = resolve_act_name(name)
    if key is None:
        return False
    _DEFAULT_ACT["name"] = key
    return True


def get_act(act: Union[bool, str, Callable], default: str = "") -> Callable:
    """Resolve an activation spec: True -> module default, False/None -> identity, str -> registry."""
    if act is True:
        return ACTS[default or _DEFAULT_ACT["name"]]
    if act in (False, None):
        return ACTS["identity"]
    if callable(act):
        return act
    return ACTS[str(act).lower()]


def torch_kernel_init():
    """torch nn.Conv2d/Linear default kernel init: kaiming_uniform(a=sqrt(5))
    = U(-1/sqrt(fan_in), 1/sqrt(fan_in)). flax variance_scaling's uniform
    bound is sqrt(3*scale/fan_in), so scale=1/3 reproduces the torch bound
    (fan_in for grouped conv kernels (H,W,Cin/g,Cout) matches torch's
    Cin/g*H*W). Matching the init distribution matters for *training-from-
    scratch* parity: lecun_normal is ~1.7x wider, which shifts early
    optimization dynamics (weight-decay equilibria, relative step sizes)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch conv/linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvRaw(nn.Module):
    """Bare conv2d with torch-style explicit padding; named to translate torch nn.Conv2d leaves."""

    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    p: Optional[Union[int, Tuple[int, int]]] = None
    g: int = 1
    d: int = 1
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.k)
        p = self.p
        if p is None:
            p = tuple(autopad(list(k), None, self.d))
        p = _pair(p)
        fan_in = k[0] * k[1] * (x.shape[-1] // self.g)
        return nn.Conv(
            features=self.c2,
            kernel_size=k,
            strides=_pair(self.s),
            padding=[(p[0], p[0]), (p[1], p[1])],
            feature_group_count=self.g,
            kernel_dilation=_pair(self.d),
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="m",
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(fan_in),
        )(x)


def conv2d(x, c2, k=1, s=1, p=None, g=1, d=1, bias=False, dtype=None, name="conv", kernel_init=None):
    """Inline helper creating a torch-compatible nn.Conv inside @nn.compact bodies."""
    kk = _pair(k)
    if p is None:
        p = tuple(autopad(list(kk), None, d))
    pp = _pair(p)
    return nn.Conv(
        features=c2,
        kernel_size=kk,
        strides=_pair(s),
        padding=[(pp[0], pp[0]), (pp[1], pp[1])],
        feature_group_count=g,
        kernel_dilation=_pair(d),
        use_bias=bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
        kernel_init=kernel_init or torch_kernel_init(),
        bias_init=torch_bias_init(kk[0] * kk[1] * (x.shape[-1] // g)),
    )(x)


def batch_norm(x, train: bool, name="bn"):
    """BN matching the reference init (eps=1e-3, momentum=0.03 torch => 0.97 flax).

    Training normalizes in float32 (stability under bfloat16 activations;
    batch statistics are always computed in f32 by flax regardless of dtype).
    Eval normalizes in the ACTIVATION dtype: with running stats BN is a pure
    per-channel affine, and keeping it f32 made every conv's epilogue an
    f32 elementwise chain at full feature-map shape — measured 2.9 GB/batch
    of standalone converts plus f32 fusion outputs in the rtdetr-l bs32 HLO,
    the single largest avoidable HBM cost in the inference graphs. For f32
    activations eval math is unchanged bit-for-bit."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.97,
        epsilon=1e-3,
        dtype=jnp.float32 if train else x.dtype,
        param_dtype=jnp.float32,
        name=name,
    )(x)


class Conv(nn.Module):
    """conv2d + BatchNorm + SiLU (reference: conv.py:65)."""

    c1: int
    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        x = conv2d(x, self.c2, self.k, self.s, self.p, self.g, self.d, False, self.dtype, "conv")
        x = batch_norm(x, train)
        return get_act(self.act)(x).astype(self.dtype or in_dt)


class ConvE(nn.Module):
    """Conv with ELU default activation (fork module, reference: conv.py:85)."""

    c1: int
    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        x = conv2d(x, self.c2, self.k, self.s, self.p, self.g, self.d, False, self.dtype, "conv")
        x = batch_norm(x, train)
        return get_act(self.act, default="elu")(x).astype(self.dtype or in_dt)


class ConvGN(nn.Module):
    """Conv with GroupNorm (fork module, reference: conv.py:105)."""

    c1: int
    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    gn_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        x = conv2d(x, self.c2, self.k, self.s, self.p, self.g, self.d, False, self.dtype, "conv")
        groups = math.gcd(self.gn_groups, self.c2)
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="gn")(x)
        return get_act(self.act)(x).astype(self.dtype or in_dt)


class DWConv(nn.Module):
    """Depthwise Conv: groups = gcd(c1, c2) (reference: conv.py:687)."""

    c1: int
    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        g = math.gcd(self.c1, self.c2)
        x = conv2d(x, self.c2, self.k, self.s, None, g, self.d, False, self.dtype, "conv")
        x = batch_norm(x, train)
        return get_act(self.act)(x).astype(self.dtype or in_dt)


class LightConv(nn.Module):
    """1x1 conv + depthwise conv with ReLU (reference: conv.py:669)."""

    c1: int
    c2: int
    k: int = 1
    act: Union[bool, str] = "relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c1, self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.c2, self.k, act=self.act, dtype=self.dtype, name="conv2")(x, train)


class Conv2(nn.Module):
    """Simplified RepConv: kxk conv + parallel 1x1 branch, shared BN+act
    (reference: conv.py:643). XLA folds both convs at inference; the explicit
    fuse_convs weight surgery of the torch original is unnecessary here."""

    c1: int
    c2: int
    k: Union[int, Tuple[int, int]] = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        y = conv2d(x, self.c2, self.k, self.s, self.p, self.g, self.d, False, self.dtype, "conv")
        y = y + conv2d(x, self.c2, 1, self.s, autopad(1, self.p, self.d), self.g, self.d, False, self.dtype, "cv2")
        y = batch_norm(y, train)
        return get_act(self.act)(y).astype(self.dtype or in_dt)


class DWConvTranspose2d(nn.Module):
    """Depthwise transpose convolution, groups=gcd(c1, c2) (reference:
    conv.py:943). Raw torch nn.ConvTranspose2d semantics: bias=True, no
    BN/act; output size (in-1)*s - 2*p1 + k + p2.

    Implemented as an input-dilated grouped conv (lhs_dilation=s, spatially
    flipped kernel) because that is the form XLA lowers natively with
    feature_group_count; flax ConvTranspose has no groups support."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    p2: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(self.c1, self.c2)
        kk, ss = _pair(self.k), _pair(self.s)
        # Stored pre-flip: kernel[ky,kx,i,j*c2/g+o] = W_torch[j*c1/g+i, o, ky, kx]
        w = self.param("kernel", torch_kernel_init(), (*kk, self.c1 // g, self.c2), jnp.float32)
        b = self.param("bias", torch_bias_init(kk[0] * kk[1] * (self.c1 // g)), (self.c2,), jnp.float32)
        dt = self.dtype or x.dtype
        pad = [
            (kk[0] - 1 - self.p1, kk[0] - 1 - self.p1 + self.p2),
            (kk[1] - 1 - self.p1, kk[1] - 1 - self.p1 + self.p2),
        ]
        y = jax.lax.conv_general_dilated(
            x.astype(dt), jnp.flip(w, (0, 1)).astype(dt),
            window_strides=(1, 1), padding=pad, lhs_dilation=ss,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g)
        return y + b.astype(dt)


class ConvTranspose(nn.Module):
    """ConvTranspose2d + optional BN + act (reference: conv.py:951)."""

    c1: int
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        x = conv_transpose2d(x, self.c2, self.k, self.s, self.p, bias=not self.bn, dtype=self.dtype, name="conv_transpose")
        if self.bn:
            x = batch_norm(x, train)
        return get_act(self.act)(x).astype(self.dtype or in_dt)


def conv_transpose2d(x, c2, k, s, p=0, bias=True, dtype=None, name="m"):
    """torch-compatible ConvTranspose2d: lax.conv_transpose with kernel flip.

    torch output size = (in-1)*s - 2p + k. We request VALID transpose then crop p
    on each side, matching torch exactly for the configurations used here.
    """
    kk, ss, pp = _pair(k), _pair(s), _pair(p)
    y = nn.ConvTranspose(
        features=c2,
        kernel_size=kk,
        strides=ss,
        padding="VALID",
        use_bias=bias,
        transpose_kernel=True,  # match torch gradient-of-conv semantics for weight sharing
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )(x)
    if pp != (0, 0):
        y = y[:, pp[0] : y.shape[1] - pp[0], pp[1] : y.shape[2] - pp[1], :]
    return y


class Focus(nn.Module):
    """Space-to-depth 2x then conv (reference: conv.py:972)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Union[bool, str] = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch order: cat(x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2], x[..., 1::2, 1::2])
        parts = (x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :])
        x = jnp.concatenate(parts, axis=-1)
        return Conv(self.c1 * 4, self.c2, self.k, self.s, self.p, self.g, act=self.act, dtype=self.dtype, name="conv")(x, train)


class GhostConv(nn.Module):
    """Ghost Convolution: half real conv, half cheap conv (reference: conv.py:991).

    NOTE: the fork modifies the stock cheap branch (5x5 depthwise) to a 3x3
    dilation-2 full conv (conv.py:1004); we reproduce the fork's version."""

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
        return jnp.concatenate((y, y2), axis=-1)


class RepConv(nn.Module):
    """RepVGG-style re-parameterizable conv: 3x3 + 1x1 (+ identity BN) branches
    summed pre-activation (reference: conv.py:1021). Deploy-time fusion
    (reference fuse_convs, conv.py:1090) is a param transform —
    `fuse_repconv` below folds the branches into ONE biased conv consumed by
    the `deploy` form here. XLA fuses elementwise epilogues but never folds
    PARALLEL convs, so this halves the conv count of every RepC3/RepCSP at
    serving time (same win measured at 1.37x for the NAS QARepVGG fold).
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    bn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dt = x.dtype
        assert self.k == 3 and self.p == 1
        # self-select the form from the BOUND param layout: fuse_model
        # replaces this module's subtree with {"reparam": {kernel, bias}}, so
        # a fused tree picks the deploy graph and a train tree the branches —
        # no global mode flag, correct under any nesting (RepC3/RepCSP) and
        # for direct module use. init never sees "reparam" -> train form.
        if not train and self.has_variable("params", "reparam"):
            # d=1 always: the train-form branches build conv1/conv2 with
            # default dilation 1 (matching the reference, whose fused conv
            # inherits conv1's dilation), so the deploy form must too
            y = conv2d(x, self.c2, self.k, self.s, self.p, self.g, 1, True, self.dtype, "reparam")
            return get_act(self.act)(y).astype(self.dtype or in_dt)
        y1 = Conv(self.c1, self.c2, self.k, self.s, p=self.p, g=self.g, act=False, dtype=self.dtype, name="conv1")(x, train)
        y2 = Conv(self.c1, self.c2, 1, self.s, p=self.p - self.k // 2, g=self.g, act=False, dtype=self.dtype, name="conv2")(x, train)
        ident = 0
        if self.bn and self.c2 == self.c1 and self.s == 1:
            ident = batch_norm(x, train, name="bn")
        return get_act(self.act)(y1 + y2 + ident).astype(self.dtype or in_dt)


def fuse_repconv(params: dict, stats: dict, eps: float = 1e-3):
    """Fold a trained RepConv subtree into (kernel (3,3,c1/g,c2), bias (c2,)).

    Standard RepVGG re-parameterization (reference RepConv.get_equivalent_kernel_bias,
    conv.py:1055): BN-fold each branch, center-pad the 1x1 kernel into the
    3x3, add the (optional) identity BN as a centered per-group eye. Exact
    algebra — parity asserted by tests/test_repconv_fuse.py.
    """
    import numpy as np

    def bn_fold(kernel, bn_p, bn_s):
        s = np.asarray(bn_p["scale"], np.float32) / np.sqrt(np.asarray(bn_s["var"], np.float32) + eps)
        return np.asarray(kernel, np.float32) * s, np.asarray(bn_p["bias"], np.float32) - np.asarray(bn_s["mean"], np.float32) * s

    w3, b3 = bn_fold(params["conv1"]["conv"]["kernel"], params["conv1"]["bn"], stats["conv1"]["bn"])
    w1, b1 = bn_fold(params["conv2"]["conv"]["kernel"], params["conv2"]["bn"], stats["conv2"]["bn"])
    w = w3.copy()
    w[1:2, 1:2] += w1
    b = b3 + b1
    if "bn" in params:  # identity branch (bn=True, c1==c2, s==1)
        cin, c2 = w.shape[2], w.shape[3]
        s_id = np.asarray(params["bn"]["scale"], np.float32) / np.sqrt(np.asarray(stats["bn"]["var"], np.float32) + eps)
        groups = c2 // cin
        for gi in range(groups):  # per-group eye: channel j of group gi reads input channel j
            for j in range(cin):
                w[1, 1, j, gi * cin + j] += s_id[gi * cin + j]
        b += np.asarray(params["bn"]["bias"], np.float32) - np.asarray(stats["bn"]["mean"], np.float32) * s_id
    return w, b


class ChannelAttention(nn.Module):
    """Global-avg-pool -> 1x1 conv -> sigmoid channel gate (reference: conv.py:1125)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = conv2d(pooled, self.channels, 1, 1, 0, bias=True, dtype=self.dtype, name="fc")
        return x * jax.nn.sigmoid(gate)


class SpatialAttention(nn.Module):
    """Spatial gate from channel mean+max maps (reference: conv.py:1140)."""

    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True), jnp.max(x, axis=-1, keepdims=True)], axis=-1)
        gate = conv2d(stat, 1, self.kernel_size, 1, self.kernel_size // 2, bias=False, dtype=self.dtype, name="cv1")
        return x * jax.nn.sigmoid(gate)


class CBAM(nn.Module):
    """Channel then spatial attention (reference: conv.py:1245).

    NOTE: parse_model's base-module arg rewrite passes (c1, c2) positionally,
    so yaml rows like `[-1, 1, CBAM, [512]]` feed the scaled channel count
    into kernel_size — the reference asserts kernel in {3,7} and would crash
    on its own yolo11_CBam.yaml. We clamp to 7 instead so the config runs."""

    c1: int
    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size if self.kernel_size in {3, 7} else 7
        x = ChannelAttention(self.c1, dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(k, dtype=self.dtype, name="spatial_attention")(x, train)


class Concat(nn.Module):
    """Concatenate a list of tensors along channels (yaml dim=1 in NCHW == axis -1 here)."""

    dimension: int = 1

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        axis = -1 if self.dimension == 1 else self.dimension
        return jnp.concatenate(list(xs), axis=axis)


class Index(nn.Module):
    """Select one tensor from a list of inputs (reference: conv.py:1823)."""

    index: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[self.index]


class Upsample(nn.Module):
    """nn.Upsample equivalent; exact nearest-neighbor for integer scale factors."""

    size: Optional[int] = None
    scale_factor: Optional[float] = 2.0
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.size is not None:
            nh, nw = _pair(self.size)
        else:
            nh, nw = int(h * self.scale_factor), int(w * self.scale_factor)
        if self.mode == "nearest" and nh % h == 0 and nw % w == 0:
            return jnp.repeat(jnp.repeat(x, nh // h, axis=1), nw // w, axis=2)
        method = {"nearest": "nearest", "bilinear": "linear"}[self.mode]
        return jax.image.resize(x, (b, nh, nw, c), method=method)


class MaxPool2d(nn.Module):
    """torch nn.MaxPool2d equivalent (used standalone in some fork yamls)."""

    k: int
    s: Optional[int] = None
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.s if self.s is not None else self.k
        return max_pool2d(x, self.k, s, self.p)


def max_pool2d(x, k, s, p):
    """Max pool with torch-style symmetric padding (pads with -inf)."""
    kk, ss, pp = _pair(k), _pair(s), _pair(p)
    return nn.max_pool(x, kk, strides=ss, padding=[(pp[0], pp[0]), (pp[1], pp[1])])


def avg_pool2d(x, k, s=None, p=0):
    kk = _pair(k)
    ss = _pair(s) if s is not None else kk
    pp = _pair(p)
    return nn.avg_pool(x, kk, strides=ss, padding=[(pp[0], pp[0]), (pp[1], pp[1])])


def adaptive_avg_pool2d(x, out=1):
    """AdaptiveAvgPool2d((1,1)) equivalent."""
    if out == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    raise NotImplementedError


class ZeroPad2d(nn.Module):
    """nn.ZeroPad2d: zero-pad H/W by (left, right, top, bottom) — used by
    yolov3-tiny.yaml:26 ahead of its stride-1 MaxPool."""

    padding: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class TorchConvTranspose2d(nn.Module):
    """Raw transposed conv (bias, no BN/act) — the reference registers torch's
    nn.ConvTranspose2d as a parse_model base module (nn/tasks.py:1037); used
    by yolov6.yaml's upsample stages."""

    c1: int
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv_transpose2d(x, self.c2, self.k, self.s, self.p, bias=True,
                                dtype=self.dtype, name="conv_transpose")
