"""Flat-packed optimizer path (engine/optim.py apply_updates_flat): must be
numerically identical to the per-leaf tree path it replaces in the trainer
hot loop (the tree form cost ~0.29 ms/img of the bs128 train step — round-5
A/B recorded in engine/optim.py)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from spectrogram_yolov11_tpu.engine.optim import (
    OptConfig,
    OptState,
    apply_updates,
    apply_updates_flat,
    flat_opt_state,
    flatten_tree,
    init_opt_state,
    init_opt_state_flat,
    make_flat_spec,
    param_groups,
    unflatten_tree,
)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv1": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(16), jnp.float32)},
        "bn": {"scale": jnp.asarray(rng.standard_normal(16), jnp.float32),
               "bias": jnp.asarray(rng.standard_normal(16), jnp.float32)},
        "head": {"kernel": jnp.asarray(rng.standard_normal((1, 1, 16, 4)), jnp.float32)},
    }


@pytest.mark.parametrize("kind", ["sgd", "adamw"])
def test_flat_matches_tree(kind):
    params, grads = _tree(0), _tree(1)
    groups = param_groups(params)
    opt = OptConfig(kind, 0.01, 0.01, 0.9, 5e-4, 10, 0.1, 0.8, 3, 4, False)
    spec = make_flat_spec(params, groups)

    tree_p, tree_st = params, init_opt_state(params)
    flat_p, flat_st = flatten_tree(params), init_opt_state_flat(spec)
    for step in range(3):
        ni = jnp.asarray(step * 2, jnp.int32)  # exercise warmup lr indexing
        tree_p, tree_st = apply_updates(tree_p, grads, tree_st, opt, groups, 5e-4, lr_step=ni)
        flat_p, flat_st = apply_updates_flat(flat_p, flatten_tree(grads), flat_st, opt, spec, 5e-4, lr_step=ni)
    un = unflatten_tree(flat_p, spec)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6, rtol=1e-6),
        tree_p, un)


def test_flatten_roundtrip_and_migration():
    params = _tree(2)
    groups = param_groups(params)
    spec = make_flat_spec(params, groups)
    rt = unflatten_tree(flatten_tree(params), spec)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # group ids land on the right elements: bias=1, norm scale=2, kernels=0
    n_bias = sum(np.asarray(l).size for p, l in jax.tree_util.tree_leaves_with_path(params)
                 if str(p[-1]) .endswith("bias')"))
    assert int((np.asarray(spec.gid) == 1).sum()) == 32  # conv1.bias + bn.bias
    assert int((np.asarray(spec.gid) == 2).sum()) == 16  # bn.scale
    # tree-form checkpoint state migrates to flat
    tree_st = OptState(step=jnp.asarray(3, jnp.int32),
                       mu=jax.tree_util.tree_map(jnp.ones_like, params),
                       nu=jax.tree_util.tree_map(jnp.zeros_like, params))
    mig = flat_opt_state(tree_st, spec)
    assert mig.mu.shape == (spec.n,) and float(mig.mu.sum()) == spec.n
    assert int(mig.step) == 3
