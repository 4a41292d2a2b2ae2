"""SAM core parity vs the torch reference (converted weights) + prompt smoke.

Reference: models/sam/modules/{encoders.py:23 ImageEncoderViT, :165
PromptEncoder; decoders.py:11 MaskDecoder; transformer.py:12 TwoWayTransformer}.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.models.sam import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
    SAMPredictor,
)
from spectrogram_yolov11_tpu.utils.torch_compat import load_state_into_variables, torch_state_to_variables

torch = pytest.importorskip("torch")


def _convert(tmodule, jmodule, init_args, init_kwargs=None):
    v = jmodule.init(jax.random.PRNGKey(0), *init_args, **(init_kwargs or {}))
    state = {k: p.detach().numpy() for k, p in tmodule.state_dict().items()}
    return load_state_into_variables(dict(v), torch_state_to_variables(state), strict=True)


def test_mask_decoder_parity():
    from oracle import load_reference

    load_reference()
    from ultralytics.models.sam.modules.decoders import MaskDecoder as TMaskDecoder
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer as TTwoWay

    torch.manual_seed(0)
    td = 64
    tm = TMaskDecoder(transformer_dim=td, transformer=TTwoWay(depth=2, embedding_dim=td, num_heads=4, mlp_dim=128))
    tm.eval()
    rng = np.random.default_rng(0)
    emb = rng.normal(0, 1, (1, td, 8, 8)).astype(np.float32)
    pe = rng.normal(0, 1, (1, td, 8, 8)).astype(np.float32)
    sparse = rng.normal(0, 1, (2, 3, td)).astype(np.float32)
    dense = rng.normal(0, 1, (2, td, 8, 8)).astype(np.float32)
    with torch.no_grad():
        m_t, iou_t = tm(torch.from_numpy(emb), torch.from_numpy(pe), torch.from_numpy(sparse),
                        torch.from_numpy(dense), multimask_output=True)

    jm = MaskDecoder(transformer_dim=td, num_heads=4, mlp_dim=128)
    v = _convert(tm, jm, (jnp.asarray(emb.transpose(0, 2, 3, 1)), jnp.asarray(pe.transpose(0, 2, 3, 1)),
                          jnp.asarray(sparse), jnp.asarray(dense.transpose(0, 2, 3, 1))),
                 {"multimask_output": True})
    m_j, iou_j = jm.apply(v, jnp.asarray(emb.transpose(0, 2, 3, 1)), jnp.asarray(pe.transpose(0, 2, 3, 1)),
                          jnp.asarray(sparse), jnp.asarray(dense.transpose(0, 2, 3, 1)), multimask_output=True)
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou_j), iou_t.numpy(), atol=2e-4)


def test_prompt_encoder_parity():
    from oracle import load_reference

    load_reference()
    from ultralytics.models.sam.modules.encoders import PromptEncoder as TPromptEncoder

    torch.manual_seed(1)
    tm = TPromptEncoder(embed_dim=32, image_embedding_size=(8, 8), input_image_size=(128, 128), mask_in_chans=8)
    tm.eval()
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 128, (2, 3, 2)).astype(np.float32)
    lab = rng.integers(0, 2, (2, 3)).astype(np.int64)
    boxes = rng.uniform(0, 128, (2, 4)).astype(np.float32)  # torch: (B, 4) one box per image
    masks = rng.normal(0, 1, (2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        sp_t, dn_t = tm((torch.from_numpy(pts), torch.from_numpy(lab)), torch.from_numpy(boxes),
                        torch.from_numpy(masks))
        pe_t = tm.get_dense_pe()

    jm = PromptEncoder(embed_dim=32, image_embedding_size=(8, 8), input_image_size=(128, 128), mask_in_chans=8)
    kw = dict(points=jnp.asarray(pts), labels=jnp.asarray(lab),
              boxes=jnp.asarray(boxes.reshape(2, 1, 4)), masks=jnp.asarray(masks.transpose(0, 2, 3, 1)))
    v = _convert(tm, jm, (), kw)
    sp_j, dn_j = jm.apply(v, **kw)
    pe_j = jm.apply(v, method=PromptEncoder.get_dense_pe)
    np.testing.assert_allclose(np.asarray(sp_j), sp_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dn_j).transpose(0, 3, 1, 2), dn_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pe_j)[0].transpose(2, 0, 1), pe_t[0].numpy(), atol=2e-5)


def test_image_encoder_parity():
    from oracle import load_reference

    load_reference()
    from ultralytics.models.sam.modules.encoders import ImageEncoderViT as TEnc

    torch.manual_seed(2)
    kw = dict(img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2, out_chans=32,
              use_rel_pos=True, window_size=2, global_attn_indexes=(1,))
    tm = TEnc(**kw)
    tm.eval()
    # non-zero rel-pos so the decomposed bias path is actually exercised
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if "rel_pos" in n:
                p.copy_(torch.randn_like(p) * 0.1)
    tm.img_size = 1024  # skip the reference's 1024-anchored pos interpolation (grids already match)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    jm = ImageEncoderViT(**kw)
    v = _convert(tm, jm, (jnp.asarray(x.transpose(0, 2, 3, 1)),))
    y_j = np.asarray(jm.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y_j, y_t, atol=2e-4)


@pytest.mark.slow
def test_sam_predictor_prompt_smoke():
    """set_image + point/box prompting end-to-end on random weights."""
    pred = SAMPredictor(variant="vit_b", img_size=256)
    img = (np.random.default_rng(0).uniform(0, 255, (200, 300, 3))).astype(np.uint8)
    pred.set_image(img)
    masks, iou = pred.prompt(points=[[150, 100]], multimask_output=True)
    assert masks.shape == (1, 3, 200, 300) and iou.shape == (1, 3)
    masks2, iou2 = pred.prompt(boxes=[50, 40, 250, 160])
    assert masks2.shape == (1, 1, 200, 300)
