"""RepConv deploy-time re-parameterization: exact-algebra parity.

Reference: RepConv.get_equivalent_kernel_bias / fuse_convs
(/root/reference/ultralytics/nn/modules/conv.py:1055,1090) and
BaseModel.fuse (/root/reference/ultralytics/nn/tasks.py:240). Here the fold
is a pure pytree transform (`nn.tasks.fuse_model` + `conv.fuse_repconv`)
consumed by the deploy form of RepConv; XLA never folds PARALLEL convs, so
this is a real graph simplification at serving time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogram_yolov11_tpu.nn.modules.conv import RepConv, fuse_repconv
from spectrogram_yolov11_tpu.nn.tasks import build_model, fuse_model


def _perturb(tree, key, scale=0.2):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for a, k in zip(leaves, keys):
        noise = jax.random.normal(k, a.shape, jnp.float32) * scale
        out.append((a + noise).astype(a.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("bn", [False, True])
def test_repconv_module_fold(bn):
    mod = RepConv(8, 8, bn=bn)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 9, 8), jnp.float32)
    v = mod.init(jax.random.PRNGKey(1), x)
    v = {"params": _perturb(v["params"], jax.random.PRNGKey(2)),
         "batch_stats": v.get("batch_stats", {})}

    def apply(vv, k, train):
        xi = x if k is None else x + jax.random.normal(k, x.shape) * 0.5
        return mod.apply(vv, xi, train=train, mutable=["batch_stats"] if train else False), None

    for i in range(2):  # move running stats off init
        (_, upd), _ = apply(v, jax.random.PRNGKey(3 + i), True)
        v = {**v, "batch_stats": upd["batch_stats"]}

    ref = mod.apply(v, x, train=False)
    k, b = fuse_repconv(v["params"], v["batch_stats"])
    assert k.shape == (3, 3, 8, 8) and b.shape == (8,)
    # the deploy form self-selects on the bound param layout
    got = mod.apply({"params": {"reparam": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}},
                    x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fuse_model_graph_parity():
    """fuse_model folds every RepConv in a parsed graph; outputs match."""
    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "RepC3", [16]],
        ],
        "head": [[-1, 1, "Classify", [3]]],
    }
    m = build_model(cfg, verbose=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1))
    v = {**v, "params": _perturb(v["params"], jax.random.PRNGKey(2), scale=0.05)}
    # move BN running stats off init so the fold has real statistics to fold
    _, upd = m.graph.apply(v, x, train=True, mutable=["batch_stats"])
    v = {**v, "batch_stats": upd["batch_stats"]}

    ref = m.apply(v, x, train=False)
    m2, v2 = fuse_model(m, v)
    assert m2 is not m and m2.graph.deploy
    # every RepConv subtree replaced by a single biased conv
    flat = jax.tree_util.tree_flatten_with_path(v2["params"])[0]
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert any("reparam" in p for p in paths)
    assert not any("conv1" in p and "m_0" in p for p in paths)
    got = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
    # the original pair is untouched and still evaluates in train form
    again = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(again), np.asarray(ref), atol=0)


def test_fuse_model_skips_ddwconv_false_positive():
    """DDWConv's param layout (conv1=3x3 + conv2=1x1, both with bn) shape-matches
    a RepConv whenever c1 == 8*c2; fuse_model must leave it untouched (ADVICE r3)."""
    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "DDWConv", [8, 3, 2]],  # c1=64 == 8*c2=8 -> shape-degenerate corner
        ],
        "head": [[-1, 1, "Classify", [2]]],
    }
    m = build_model(cfg, verbose=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1))
    ref = m.apply(v, x, train=False)
    m2, v2 = fuse_model(m, v)
    flat = jax.tree_util.tree_flatten_with_path(v2["params"])[0]
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert not any("reparam" in p for p in paths)
    got = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_fuse_model_params_only_tree_left_untouched():
    """A params-only tree (no batch_stats for the RepConv branches) must not
    KeyError inside fuse_repconv — the subtree stays in train form (ADVICE r3)."""
    cfg = {
        "nc": 3,
        "backbone": [[-1, 1, "Conv", [16, 3, 2]], [-1, 1, "RepC3", [16]]],
        "head": [[-1, 1, "Classify", [3]]],
    }
    m = build_model(cfg, verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    stripped = {"params": v["params"]}  # no batch_stats at all
    m2, v2 = fuse_model(m, stripped)
    assert m2 is m and v2 is stripped


def test_repconv_deploy_ignores_dilation():
    """RepConv(d != 1): train branches use dilation 1, so the fused deploy
    form must too (reference fused conv inherits conv1's dilation=1)."""
    mod = RepConv(8, 8, d=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 9, 8), jnp.float32)
    v = mod.init(jax.random.PRNGKey(1), x)
    ref = mod.apply(v, x, train=False)
    k, b = fuse_repconv(v["params"], v["batch_stats"])
    got = mod.apply({"params": {"reparam": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}},
                    x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fuse_model_noop_without_repconv():
    cfg = {
        "nc": 2,
        "backbone": [[-1, 1, "Conv", [8, 3, 2]]],
        "head": [[-1, 1, "Classify", [2]]],
    }
    m = build_model(cfg, verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    m2, v2 = fuse_model(m, v)
    assert m2 is m and v2 is v
