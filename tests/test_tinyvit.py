"""TinyViT (MobileSAM encoder) parity vs the torch reference + predictor smoke.

Reference: models/sam/modules/tiny_encoder.py, build.py:56 build_mobile_sam.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.models.tiny_encoder import MBConv, TinyAttention, TinyViT, TinyViTBlock
from spectrogram_yolov11_tpu.utils.torch_compat import load_state_into_variables, torch_state_to_variables

torch = pytest.importorskip("torch")


def _load_ref():
    from oracle import load_reference

    load_reference()


def _convert(tmodule, v):
    state = {k: p.detach().numpy() for k, p in tmodule.state_dict().items()}
    return load_state_into_variables(dict(v), torch_state_to_variables(state), strict=False)


def test_tiny_attention_parity():
    """Window attention with relative-position bias tables (tiny_encoder.py:363)."""
    _load_ref()
    from ultralytics.models.sam.modules.tiny_encoder import Attention as TAttn

    torch.manual_seed(0)
    tm = TAttn(dim=32, key_dim=8, num_heads=4, attn_ratio=1, resolution=(5, 5))
    tm.eval()
    with torch.no_grad():  # give the bias table real values
        tm.attention_biases.normal_(0, 0.5)
    tm.eval()  # refresh the cached ab after mutation
    jm = TinyAttention(dim=32, key_dim=8, num_heads=4, attn_ratio=1.0, resolution=(5, 5))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 25, 32)).astype(np.float32)
    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = _convert(tm, v)
    ours = jm.apply(v, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_tinyvit_block_parity():
    """Full block: windowed attention + local dwconv + MLP (tiny_encoder.py:492)."""
    _load_ref()
    from ultralytics.models.sam.modules.tiny_encoder import TinyViTBlock as TBlock

    torch.manual_seed(1)
    tm = TBlock(dim=32, input_resolution=(12, 12), num_heads=4, window_size=5)
    tm.eval()
    jm = TinyViTBlock(dim=32, num_heads=4, window_size=5)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 12, 12, 32)).astype(np.float32)
    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = _convert(tm, v)
    ours = jm.apply(v, jnp.asarray(x))
    with torch.no_grad():  # torch block consumes (B, N, C)
        ref = tm(torch.from_numpy(x.reshape(1, 144, 32))).numpy().reshape(1, 12, 12, 32)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_tinyvit_trunk_parity():
    """Small full trunk on converted weights, incl. MBConv stage, patch
    merging (stride-1 magic dim 320) and the SAM neck."""
    _load_ref()
    from ultralytics.models.sam.modules.tiny_encoder import TinyViT as TTinyViT

    torch.manual_seed(2)
    kw = dict(embed_dims=(16, 32, 40, 320), depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
              window_sizes=(7, 7, 14, 7))
    tm = TTinyViT(img_size=64, num_classes=0, **kw)
    tm.eval()
    jm = TinyViT(img_size=64, **kw)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = _convert(tm, v)
    ours = jm.apply(v, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (1, 4, 4, 256)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


@pytest.mark.slow
def test_mobile_sam_predictor():
    import cv2

    from spectrogram_yolov11_tpu.models.sam import SAM, SAMPredictor

    img = np.full((96, 96, 3), 50, np.uint8)
    cv2.circle(img, (48, 48), 20, (240, 230, 220), -1)
    p = SAM("mobile_sam")
    assert isinstance(p, SAMPredictor) and p.model.variant == "mobile_sam"
    p = SAMPredictor(variant="mobile_sam", img_size=128)
    p.set_image(img)
    masks, ious = p.prompt(points=[[48, 48]], multimask_output=True)
    assert masks.shape == (1, 3, 96, 96) and np.isfinite(ious).all()
