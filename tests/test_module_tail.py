"""Oracle-parity tests for the stock-module tail added in round 3:
Conv2, DWConvTranspose2d, C3Ghost, C3TR, ResNetLayer (+ TransformerBlock via
C3TR). Reference: /root/reference/ultralytics/nn/modules/{conv.py:643,943,
block.py:549,559,1324}.

Each test builds the reference torch module random-init, converts its
state_dict through utils/torch_compat, loads into our flax module, and
asserts forward parity.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from spectrogram_yolov11_tpu.nn import modules as M  # noqa: E402
from spectrogram_yolov11_tpu.utils.torch_compat import (  # noqa: E402
    load_state_into_variables,
    torch_state_to_variables,
)

torch = pytest.importorskip("torch")


def _ref_modules():
    from oracle import load_reference

    load_reference()
    from ultralytics.nn.modules import block as rblock
    from ultralytics.nn.modules import conv as rconv

    return rconv, rblock


def _parity(tm, fm, x_nchw, atol=2e-4, train_like=False):
    """Compare torch module vs flax module with converted weights."""
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x_nchw)).numpy()
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    v = fm.init(jax.random.PRNGKey(0), x, train=False)
    state = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    conv = torch_state_to_variables(state)
    v = load_state_into_variables(v, conv, strict=True)
    out = np.asarray(fm.apply(v, x, train=False)).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=atol, rtol=2e-3)


@pytest.fixture(scope="module")
def x32():
    return np.random.default_rng(0).normal(0, 0.5, (2, 32, 16, 16)).astype(np.float32)


def test_conv2_parity(x32):
    rconv, _ = _ref_modules()
    torch.manual_seed(0)
    _parity(rconv.Conv2(32, 48, 3, 2), M.Conv2(32, 48, 3, 2), x32)


def test_conv2_fused_matches_unfused(x32):
    """The torch fuse_convs surgery must equal the two-branch forward we keep."""
    rconv, _ = _ref_modules()
    torch.manual_seed(1)
    tm = rconv.Conv2(32, 32, 3, 1)
    tm.eval()
    with torch.no_grad():
        y0 = tm(torch.from_numpy(x32)).numpy()
        tm.fuse_convs()
        y1 = tm(torch.from_numpy(x32)).numpy()
    np.testing.assert_allclose(y0, y1, atol=1e-5)


@pytest.mark.parametrize("c1,c2,k,s,p1,p2", [(8, 8, 4, 2, 1, 0), (8, 8, 3, 2, 1, 1), (4, 8, 2, 2, 0, 0)])
def test_dwconvtranspose2d_parity(c1, c2, k, s, p1, p2):
    torch.manual_seed(2)
    tm = torch.nn.ConvTranspose2d(c1, c2, k, s, p1, p2, groups=np.gcd(c1, c2))
    tm.eval()
    x_nchw = np.random.default_rng(1).normal(0, 1, (2, c1, 9, 9)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x_nchw)).numpy()
    fm = M.DWConvTranspose2d(c1, c2, k, s, p1, p2)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    v = fm.init(jax.random.PRNGKey(0), x)
    g = np.gcd(c1, c2)
    w_t = tm.weight.detach().numpy()  # (c1, c2/g, k, k)
    w_j = w_t.reshape(g, c1 // g, c2 // g, k, k).transpose(3, 4, 1, 0, 2).reshape(k, k, c1 // g, c2)
    v = {"params": {"kernel": jnp.asarray(w_j), "bias": jnp.asarray(tm.bias.detach().numpy())}}
    out = np.asarray(fm.apply(v, x)).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_c3ghost_parity(x32):
    _, rblock = _ref_modules()
    torch.manual_seed(3)
    _parity(rblock.C3Ghost(32, 32, n=2), M.C3Ghost(32, 32, n=2), x32)


def test_c3tr_parity(x32):
    _, rblock = _ref_modules()
    torch.manual_seed(4)
    _parity(rblock.C3TR(32, 32, n=2), M.C3TR(32, 32, n=2), x32, atol=5e-4)


def test_resnetlayer_parity(x32):
    _, rblock = _ref_modules()
    torch.manual_seed(5)
    _parity(rblock.ResNetLayer(32, 16, s=2, is_first=False, n=2), M.ResNetLayer(32, 16, s=2, is_first=False, n=2), x32)


def test_resnetlayer_stem_parity():
    _, rblock = _ref_modules()
    torch.manual_seed(6)
    x = np.random.default_rng(2).normal(0, 0.5, (1, 3, 64, 64)).astype(np.float32)
    _parity(rblock.ResNetLayer(3, 16, is_first=True), M.ResNetLayer(3, 16, is_first=True), x)


def test_resnet_yaml_parses():
    """A ResNetLayer-backboned YAML builds through parse_model with the
    reference's c2 bookkeeping (nn/tasks.py:1122)."""
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    d = {
        "nc": 4,
        "backbone": [
            [-1, 1, "ResNetLayer", [3, 16, 1, True, 1]],   # stem -> 16 ch
            [-1, 1, "ResNetLayer", [16, 8, 2, False, 2]],  # -> 32 ch (e*8)
            [-1, 1, "ResNetLayer", [32, 16, 2, False, 2]], # -> 64 ch
            [-1, 1, "ResNetLayer", [64, 32, 2, False, 2]], # -> 128 ch
        ],
        "head": [[[1, 2, 3], 1, "Detect", ["nc"]]],
    }
    m = build_model(d, verbose=False)
    x = jnp.zeros((1, 128, 128, 3))
    vs = jax.eval_shape(lambda: m.graph.init(jax.random.PRNGKey(0), x, train=False))
    out = jax.eval_shape(lambda v: m.graph.apply(v, x, train=False), vs)
    assert out is not None


def test_dyhead_block_and_config():
    """DyHeadBlock (TPU-native DCNv2-gather + DyReLU; reference ships it
    commented out at head.py:880-991) refines a 3-level pyramid, preserves
    shapes, is finite, and differentiates; zero-offset init means the DCN
    starts as a plain (masked) 3x3 conv."""
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.nn import modules as M

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(0, 1, (2, s, s, 32)).astype(np.float32)) for s in (16, 8, 4)]
    blk = M.DyHeadBlock(32)
    v = blk.init(jax.random.PRNGKey(0), xs)
    outs = blk.apply(v, xs)
    assert [o.shape for o in outs] == [x.shape for x in xs]
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in outs)

    def loss(params):
        outs = blk.apply(params, xs)
        return sum(jnp.sum(o ** 2) for o in outs)

    g = jax.grad(lambda p: loss(p))(v)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_dydcnv2_zero_offset_matches_masked_conv():
    """With zero offsets the deformable gather must equal a plain 3x3 conv
    (same taps) modulated by the sigmoid mask."""
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.nn.modules.dyhead import DyDCNv2

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 18))
    mask = jnp.full((1, 8, 8, 9), 80.0)  # sigmoid -> 1
    m = DyDCNv2(4, 6, norm=False)
    v = m.init(jax.random.PRNGKey(0), x, offset, mask)
    y = m.apply(v, x, offset, mask)

    w = np.asarray(v["params"]["weight"])  # (9, cin, cout)
    k = jnp.asarray(w.reshape(3, 3, 4, 6))
    ref = jax.lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_aglu_parity(x32):
    """AGLU (reference nn/modules/activation.py:8) — learnable unified
    activation; parity on converted lambd/kappa scalars."""
    from oracle import load_reference

    load_reference()
    from ultralytics.nn.modules.activation import AGLU as TorchAGLU

    torch.manual_seed(3)
    _parity(TorchAGLU(), M.AGLU(), x32, atol=1e-5)


def test_aglu_yaml_layer_and_grad():
    """AGLU is registered for yaml graphs (channel-preserving) and its
    lambd/kappa receive gradients."""
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.nn.tasks import MODULE_REGISTRY

    assert MODULE_REGISTRY["AGLU"] is M.AGLU
    m = M.AGLU()
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 8, 8, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(v)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.sum(jnp.abs(leaf))) > 0
