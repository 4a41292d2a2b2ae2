"""YOLO-NAS native architecture tests (nn/modules/nas.py,
cfg/models/nas/yolo_nas_s.yaml, models/nas.py facade).

No oracle exists offline (the reference wraps super-gradients downloads,
/root/reference/ultralytics/models/nas/model.py:53), so these tests verify
the properties the design claims instead:
- the QARepVGG block's three branches fold EXACTLY into one dense 3x3 conv
  in eval mode (the quantization-aware re-parameterization guarantee);
- the full yolo_nas_s graph compiles, runs, and emits the standard 3-level
  detect pyramid with finite values;
- the NAS facade builds/validates the documented surface.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from spectrogram_yolov11_tpu.nn import modules as M  # noqa: E402


def test_qarepvgg_folds_to_single_conv():
    """Eval-mode QARepVGG(x) == relu(postBN(conv3x3_folded(x) + b)) where the
    folded kernel sums: BN-scaled 3x3 branch + center-padded 1x1 branch +
    center identity."""
    c = 8
    m = M.QARepVGG(c, c, 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, c)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # perturb BN stats away from init so the fold is non-trivial
    import flax

    v = flax.core.unfreeze(v)
    bs = v["batch_stats"]
    bs["branch_3x3_bn"]["mean"] = jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32))
    bs["branch_3x3_bn"]["var"] = jnp.asarray(rng.uniform(0.5, 2.0, (c,)).astype(np.float32))
    bs["post_bn"]["mean"] = jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32))
    bs["post_bn"]["var"] = jnp.asarray(rng.uniform(0.5, 2.0, (c,)).astype(np.float32))
    ref = np.asarray(m.apply(v, x, train=False))

    p = v["params"]
    eps = 1e-3
    w3 = np.asarray(p["branch_3x3"]["kernel"])  # HWIO
    g3 = np.asarray(p["branch_3x3_bn"]["scale"])
    b3 = np.asarray(p["branch_3x3_bn"]["bias"])
    mu3 = np.asarray(bs["branch_3x3_bn"]["mean"])
    var3 = np.asarray(bs["branch_3x3_bn"]["var"])
    s3 = g3 / np.sqrt(var3 + eps)
    w_fold = w3 * s3  # scale per out channel (last axis of HWIO)
    bias_fold = b3 - mu3 * s3
    w1 = np.asarray(p["branch_1x1"]["kernel"])  # (1,1,I,O)
    w_fold[1:2, 1:2] += w1
    w_fold[1, 1] += np.eye(c, dtype=np.float32)  # identity branch

    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w_fold), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bias_fold)
    gp, bp = p["post_bn"]["scale"], p["post_bn"]["bias"]
    mup, varp = bs["post_bn"]["mean"], bs["post_bn"]["var"]
    y = (y - mup) * gp / jnp.sqrt(varp + eps) + bp
    out = np.asarray(jax.nn.relu(y))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_qarepvgg_stride2_has_no_identity():
    m = M.QARepVGG(4, 8, 2)
    x = jnp.zeros((1, 16, 16, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 8, 8, 8)


def test_yolo_nas_s_forward_pyramid():
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.ops.decode import feat_shapes

    m = build_model("yolo_nas_s.yaml", nc=3, verbose=False)
    assert list(m.stride) == [8.0, 16.0, 32.0]
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    feats = m.apply(v, x, train=False)
    assert feat_shapes(feats) == [(16, 16), (8, 8), (4, 4)]
    for f in feats:
        box, cls = f
        assert cls.shape[-1] == 3 and box.shape[-1] == 64
        assert np.isfinite(np.asarray(box)).all() and np.isfinite(np.asarray(cls)).all()


def test_nas_facade():
    from spectrogram_yolov11_tpu.models.nas import NAS

    m = NAS("yolo_nas_s")
    assert m.task == "detect"
    with pytest.raises(NotImplementedError):
        NAS("yolo_nas_s.pt")


def test_nas_loss_trainable():
    """One value_and_grad step over the NAS graph produces finite grads."""
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.ops.losses import detection_loss

    m = build_model("yolo_nas_s.yaml", nc=2, verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    cls = jnp.zeros((2, 4), jnp.float32)
    bboxes = jnp.asarray(np.random.default_rng(2).uniform(0.2, 0.6, (2, 4, 4)).astype(np.float32))
    mask = jnp.ones((2, 4), jnp.float32)
    strides = tuple(float(s) for s in m.stride)

    def loss_fn(params):
        feats, _ = m.graph.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True, mutable=["batch_stats"]
        )
        total, _ = detection_loss(feats, cls, bboxes, mask, nc=2, imgsz=64, strides=strides)
        return total

    val, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_fuse_nas_deploy_parity():
    """fuse_nas: the re-parameterized single-conv deploy graph matches the
    trained 3-branch graph in eval mode, after real BN-stat updates."""
    from spectrogram_yolov11_tpu.models.nas import fuse_nas
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo_nas_s.yaml", nc=2, verbose=False)
    v = m.init(jax.random.PRNGKey(5), imgsz=64)
    x = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    # one train-mode pass moves BN means/vars off their init values
    _, new_stats = m.apply(v, x, train=True)
    v = {"params": v["params"], "batch_stats": new_stats}

    ref = m.apply(v, x, train=False)
    m2, v2 = fuse_nas(m, v)
    got = m2.apply(v2, x, train=False)

    # deploy tree really is re-parameterized: no branch convs remain
    flat = str(jax.tree_util.tree_structure(v2["params"]))
    assert "branch_3x3" not in flat and "reparam" in flat

    for (rb, rc), (gb, gc) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(rc), atol=2e-3, rtol=2e-3)
