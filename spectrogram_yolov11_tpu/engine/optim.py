"""Optimizer: the reference training recipe as pure jax update rules.

Reproduces the reference optimizer construction (engine/trainer.py:758-819)
and LR/momentum warmup (trainer.py:209-215, 364-375; SURVEY A13-A14):

- 3 param groups: g0 = conv/dense kernels (weight decay), g1 = norm scales
  (no decay), g2 = biases (no decay, separate warmup start at 0.1)
- 'auto' mode: SGD(lr=0.01, momentum=0.9, nesterov) when total iterations
  > 10k, else AdamW(lr = 0.002 * 5 / (4 + nc) rounded to 6dp), warmup_bias_lr
  forced 0 for Adam
- weight decay scaled by batch * accumulate / nbs
- grad clip: global norm 10.0
- per-iteration warmup over max(3 * nb, 100) iters: bias lr warmup_bias_lr->lr,
  others 0->lr, momentum 0.8->0.937
- per-epoch schedule: linear (1 - x/epochs)(1 - lrf) + lrf, or cosine

Implemented as a single pure `update` over the param pytree with group masks
derived from param paths — no optax dependency in the hot path so the whole
rule inlines into the jitted train step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class OptConfig(NamedTuple):
    kind: str  # 'sgd' | 'adamw'
    lr0: float
    lrf: float
    momentum: float
    weight_decay: float
    warmup_iters: float
    warmup_bias_lr: float
    warmup_momentum: float
    epochs: int
    nb: int  # batches per epoch
    cos_lr: bool
    clip_norm: float = 10.0


def choose_optimizer(cfg, nc: int, nb: int) -> OptConfig:
    """The 'auto' rule (reference: trainer.py:776-792)."""
    kind = str(cfg.optimizer).lower()
    lr0, momentum = cfg.lr0, cfg.momentum
    warmup_bias_lr = cfg.warmup_bias_lr
    if kind == "auto":
        iterations = cfg.epochs * nb
        if iterations > 10_000:
            kind = "sgd"
        else:
            kind = "adamw"
            lr0 = round(0.002 * 5 / (4 + nc), 6)
            momentum = 0.9
            warmup_bias_lr = 0.0
    elif kind in {"adam", "adamw", "nadam", "radam"}:
        kind = "adamw"
    elif kind == "rmsprop":
        kind = "adamw"  # closest stable stand-in on TPU; documented deviation
    else:
        kind = "sgd"
    wi = max(round(cfg.warmup_epochs * nb), 100) if cfg.warmup_epochs > 0 else -1
    return OptConfig(
        kind=kind,
        lr0=lr0,
        lrf=cfg.lrf,
        momentum=momentum,
        weight_decay=cfg.weight_decay,
        warmup_iters=wi,
        warmup_bias_lr=warmup_bias_lr,
        warmup_momentum=cfg.warmup_momentum,
        epochs=cfg.epochs,
        nb=nb,
        cos_lr=bool(cfg.cos_lr),
    )


def param_groups(params) -> Dict[str, Any]:
    """Group masks from param paths: bias / norm-scale / decayed kernels."""

    def classify(path) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        leaf = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        if leaf == "bias":
            return "bias"
        if leaf == "scale":  # BatchNorm/GroupNorm gamma
            return "norm"
        return "decay"

    return jax.tree_util.tree_map_with_path(lambda p, _: classify(p), params)


def lr_at(opt: OptConfig, step: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(lr_main, lr_bias, momentum) at integer step (0-based), all traced."""
    epoch = step // opt.nb
    x = epoch.astype(jnp.float32)
    if opt.cos_lr:
        lf = ((1 - jnp.cos(x * math.pi / opt.epochs)) / 2) * (opt.lrf - 1) + 1
    else:
        lf = jnp.maximum(1 - x / opt.epochs, 0) * (1.0 - opt.lrf) + opt.lrf
    lr = opt.lr0 * lf
    if opt.warmup_iters > 0:
        w = jnp.clip(step.astype(jnp.float32) / opt.warmup_iters, 0.0, 1.0)
        lr_main = jnp.where(step < opt.warmup_iters, w * lr, lr)
        lr_bias = jnp.where(step < opt.warmup_iters, opt.warmup_bias_lr + w * (lr - opt.warmup_bias_lr), lr)
        mom = jnp.where(
            step < opt.warmup_iters,
            opt.warmup_momentum + w * (opt.momentum - opt.warmup_momentum),
            opt.momentum,
        )
    else:
        lr_main, lr_bias, mom = lr, lr, jnp.asarray(opt.momentum)
    return lr_main, lr_bias, mom


class OptState(NamedTuple):
    step: jnp.ndarray  # int32 optimizer steps taken
    mu: Any  # momentum / exp_avg pytree
    nu: Any  # adam second moment (zeros for sgd)


def init_opt_state(params) -> OptState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return OptState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params))


def clip_global_norm(grads, max_norm: float):
    gn = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / (gn + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gn


def apply_updates(params, grads, state: OptState, opt: OptConfig, groups, weight_decay: float, lr_step=None):
    """One optimizer step. weight_decay is pre-scaled by batch*accumulate/nbs
    (reference trainer.py:300). `lr_step` (if given) indexes the LR/momentum
    warmup by dataloader iteration ni, matching the reference which warms up
    per-iteration but steps the optimizer every `accumulate` iterations.
    Returns (new_params, new_state)."""
    grads, _ = clip_global_norm(grads, opt.clip_norm)
    lr_main, lr_bias, mom = lr_at(opt, state.step if lr_step is None else lr_step)

    def group_lr(g):
        return jnp.where(g == 1, lr_bias, lr_main)

    gid = jax.tree_util.tree_map(lambda s: 1 if s == "bias" else (2 if s == "norm" else 0), groups)

    if opt.kind == "sgd":

        def upd(p, g, m, group):
            g = g + (weight_decay * p if group == 0 else 0.0)
            m_new = mom * m + g
            step_dir = g + mom * m_new  # nesterov
            lr = lr_bias if group == 1 else lr_main
            return p - lr * step_dir, m_new, jnp.zeros_like(p)

        out = jax.tree_util.tree_map(
            lambda p, g, m, n, grp: upd(p, g, m, grp), params, grads, state.mu, state.nu, gid
        )
    else:  # adamw (decoupled decay)
        # betas are FIXED for Adam-family: the reference's momentum warmup
        # only touches param groups with a "momentum" key, which Adam groups
        # lack (reference trainer.py:374-375) — so b1 stays at opt.momentum.
        b1, b2, eps = opt.momentum, 0.999, 1e-8
        t = state.step.astype(jnp.float32) + 1.0
        bc1 = 1 - b1**t
        bc2 = 1 - b2**t

        def upd(p, g, m, n, group):
            m_new = b1 * m + (1 - b1) * g
            n_new = b2 * n + (1 - b2) * (g * g)
            mhat = m_new / bc1
            nhat = n_new / bc2
            lr = lr_bias if group == 1 else lr_main
            p_new = p - lr * (mhat / (jnp.sqrt(nhat) + eps) + (weight_decay * p if group == 0 else 0.0))
            return p_new, m_new, n_new

        out = jax.tree_util.tree_map(
            lambda p, g, m, n, grp: upd(p, g, m, n, grp), params, grads, state.mu, state.nu, gid
        )

    # out is a pytree of 3-tuples at the leaves; unzip
    new_params = jax.tree_util.tree_map(lambda t3: t3[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree_util.tree_map(lambda t3: t3[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree_util.tree_map(lambda t3: t3[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, OptState(step=state.step + 1, mu=new_mu, nu=new_nu)


# -- flat-packed optimizer path ---------------------------------------------
# The tree-form apply_updates above lowers to ~3 tiny XLA kernels PER LEAF
# (~900 for yolo11n's ~300 leaves); on TPU each costs a few tens of us of
# fixed overhead, measured 0.29 ms/img of a 0.97 ms/img bs128 train step
# (round-5 A/B: full 0.970 / no-opt 0.677 / no-ema 0.966 / no-clip 0.962).
# Packing params/grads/opt-state into single flat f32 vectors turns the whole
# update into a handful of large fused elementwise kernels; the unflatten
# back to the tree is static slices, which XLA fuses into their consumers.


class FlatSpec(NamedTuple):
    treedef: Any
    shapes: Tuple[Tuple[int, ...], ...]
    sizes: Tuple[int, ...]
    # HOST numpy int8 per element (0 decay, 1 bias, 2 norm): a jnp constant
    # here would be committed to one device and breaks when the containing
    # jit runs over a >1-device mesh (partition crash -> collective hang)
    gid: Any
    n: int


def make_flat_spec(params, groups) -> FlatSpec:
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(params)
    glabels, gdef = jax.tree_util.tree_flatten(groups)
    assert treedef == gdef, "groups tree must mirror params"
    code = {"decay": 0, "bias": 1, "norm": 2}
    gid = np.concatenate([
        np.full(l.size, code[g], np.int8) for l, g in zip(leaves, glabels)
    ]) if leaves else np.zeros(0, np.int8)
    return FlatSpec(
        treedef=treedef,
        shapes=tuple(tuple(l.shape) for l in leaves),
        sizes=tuple(int(l.size) for l in leaves),
        gid=gid,
        n=int(gid.size),
    )


def flatten_tree(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([l.reshape(-1).astype(jnp.float32) for l in leaves])


def unflatten_tree(flat: jnp.ndarray, spec: FlatSpec):
    out, off = [], 0
    for shape, size in zip(spec.shapes, spec.sizes):
        out.append(flat[off : off + size].reshape(shape))
        off += size
    return jax.tree_util.tree_unflatten(spec.treedef, out)


def init_opt_state_flat(spec: FlatSpec) -> OptState:
    # NB: two DISTINCT buffers — aliased mu/nu break the train step's
    # donate_argnums ("attempt to donate the same buffer twice")
    return OptState(step=jnp.zeros((), jnp.int32),
                    mu=jnp.zeros((spec.n,), jnp.float32),
                    nu=jnp.zeros((spec.n,), jnp.float32))


def flat_opt_state(state: OptState, spec: FlatSpec) -> OptState:
    """Migrate a tree-form OptState (older checkpoints) to flat vectors."""
    if isinstance(state.mu, jnp.ndarray) and state.mu.ndim == 1:
        return state
    return OptState(step=state.step, mu=flatten_tree(state.mu), nu=flatten_tree(state.nu))


def apply_updates_flat(p_flat, g_flat, state: OptState, opt: OptConfig,
                       spec: FlatSpec, weight_decay: float, lr_step=None):
    """Same math as apply_updates, on flat f32 vectors (~6 fused kernels).
    Equality vs the tree path asserted by tests/test_optim_flat.py."""
    gn = jnp.sqrt(jnp.sum(g_flat * g_flat))
    g_flat = g_flat * jnp.minimum(1.0, opt.clip_norm / (gn + 1e-6))
    lr_main, lr_bias, mom = lr_at(opt, state.step if lr_step is None else lr_step)
    gid = jnp.asarray(spec.gid)  # trace-time constant (spec.gid is host numpy)
    is_bias = gid == 1
    is_decay = gid == 0
    lr = jnp.where(is_bias, lr_bias, lr_main)
    wd = jnp.where(is_decay, weight_decay, 0.0)

    if opt.kind == "sgd":
        g = g_flat + wd * p_flat
        new_mu = mom * state.mu + g
        step_dir = g + mom * new_mu  # nesterov
        new_p = p_flat - lr * step_dir
        new_nu = state.nu
    else:  # adamw (decoupled decay)
        b1, b2, eps = opt.momentum, 0.999, 1e-8
        t = state.step.astype(jnp.float32) + 1.0
        bc1 = 1 - b1**t
        bc2 = 1 - b2**t
        new_mu = b1 * state.mu + (1 - b1) * g_flat
        new_nu = b2 * state.nu + (1 - b2) * (g_flat * g_flat)
        mhat = new_mu / bc1
        nhat = new_nu / bc2
        new_p = p_flat - lr * (mhat / (jnp.sqrt(nhat) + eps) + wd * p_flat)

    return new_p, OptState(step=state.step + 1, mu=new_mu, nu=new_nu)


def ema_decay(updates: jnp.ndarray, decay: float = 0.9999, tau: float = 2000.0) -> jnp.ndarray:
    """Reference ModelEMA ramp (torch_utils.py:495): d = decay*(1-exp(-t/tau))."""
    return decay * (1 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_tree, new_tree, d: jnp.ndarray):
    return jax.tree_util.tree_map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d), ema_tree, new_tree)
