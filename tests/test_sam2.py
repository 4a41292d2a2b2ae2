"""SAM2 parity vs the torch reference + image/video smoke.

Reference: models/sam/modules/{utils.py:82 compute_axial_cis / :104
apply_rotary_enc; blocks.py:405 RoPEAttention, :583 MultiScaleBlock, :698
PositionEmbeddingSine; encoders.py:378 MemoryEncoder, :645 Hiera;
memory_attention.py:140 MemoryAttention; sam.py:105 SAM2Model}.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.models.sam2 import (
    SAM2Model,
    SAM2Predictor,
    SAM2VideoPredictor,
    ImageEncoder,
    MemoryAttention,
    MemoryEncoder,
    MultiScaleBlock,
    apply_rope,
    axial_rope_cos_sin,
    get_1d_sine_pe,
    sine_pos_embed_2d,
)
from spectrogram_yolov11_tpu.utils.torch_compat import load_state_into_variables, torch_state_to_variables

torch = pytest.importorskip("torch")


def _load_ref():
    from oracle import load_reference

    load_reference()


def _convert(tmodule, v):
    state = {k: p.detach().numpy() for k, p in tmodule.state_dict().items()}
    return load_state_into_variables(dict(v), torch_state_to_variables(state), strict=True)


# ---------------------------------------------------------------------------
# pure-function parity
# ---------------------------------------------------------------------------


def test_rope_parity():
    """Real-valued (cos, sin) rotation == reference complex rotation
    (utils.py:82,104), incl. the repeat_freqs_k cross-attention path."""
    _load_ref()
    from ultralytics.models.sam.modules.utils import apply_rotary_enc, compute_axial_cis

    hd, ex, ey, r = 32, 4, 4, 3
    n = ex * ey
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 2, n, hd)).astype(np.float32)
    k = rng.normal(size=(2, 2, n * r, hd)).astype(np.float32)

    fc = compute_axial_cis(dim=hd, end_x=ex, end_y=ey)
    tq, tk = apply_rotary_enc(torch.from_numpy(q), torch.from_numpy(k), fc, repeat_freqs_k=True)

    cos, sin = axial_rope_cos_sin(hd, ex, ey)
    jq = apply_rope(jnp.asarray(q), cos, sin)
    jk = apply_rope(jnp.asarray(k), jnp.tile(cos, (r, 1)), jnp.tile(sin, (r, 1)))
    np.testing.assert_allclose(np.asarray(jq), tq.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jk), tk.numpy(), atol=1e-5)


def test_sine_pos_embeds_parity():
    """2D sine map == PositionEmbeddingSine.forward; 1D == get_1d_sine_pe."""
    _load_ref()
    from ultralytics.models.sam.modules.blocks import PositionEmbeddingSine
    from ultralytics.models.sam.modules.utils import get_1d_sine_pe as t_pe1d

    pe = PositionEmbeddingSine(num_pos_feats=64)
    ref = pe(torch.zeros(1, 3, 8, 10)).numpy()[0].transpose(1, 2, 0)  # BCHW -> HWC
    ours = np.asarray(sine_pos_embed_2d(8, 10, 64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    pos = np.array([0.0, 0.25, 1.0], np.float32)
    ref1 = t_pe1d(torch.from_numpy(pos), dim=64).numpy()
    np.testing.assert_allclose(np.asarray(get_1d_sine_pe(jnp.asarray(pos), 64)), ref1, atol=1e-5)


# ---------------------------------------------------------------------------
# module parity on converted weights
# ---------------------------------------------------------------------------


def test_memory_encoder_parity():
    _load_ref()
    from ultralytics.models.sam.modules.encoders import MemoryEncoder as TMemEnc

    torch.manual_seed(0)
    tm = TMemEnc(out_dim=64)
    tm.eval()
    jm = MemoryEncoder(64, 256)

    rng = np.random.default_rng(1)
    pix = rng.normal(size=(1, 8, 8, 256)).astype(np.float32)
    mask = rng.normal(size=(1, 128, 128, 1)).astype(np.float32)
    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(pix), jnp.asarray(mask))
    v = _convert(tm, v)

    feats, pos = jm.apply(v, jnp.asarray(pix), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(pix.transpose(0, 3, 1, 2)), torch.from_numpy(mask.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(feats), ref["vision_features"].numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pos), ref["vision_pos_enc"][0].numpy()[0].transpose(1, 2, 0), atol=1e-5)


def test_memory_attention_parity():
    """Full memory-attention stack on converted weights, incl. object-pointer
    tokens excluded from RoPE (memory_attention.py:140)."""
    _load_ref()
    from ultralytics.models.sam.modules.memory_attention import (
        MemoryAttention as TMemAttn,
        MemoryAttentionLayer as TLayer,
    )

    torch.manual_seed(0)
    tm = TMemAttn(d_model=256, pos_enc_at_input=True, layer=TLayer(), num_layers=2)
    tm.eval()
    jm = MemoryAttention(256, 2)

    n, r, nptr = 64, 3, 4  # 8x8 grid, 3 memory frames, 4 pointer tokens
    rng = np.random.default_rng(2)
    curr = rng.normal(size=(1, n, 256)).astype(np.float32)
    curr_pos = rng.normal(size=(1, n, 256)).astype(np.float32)
    mem = rng.normal(size=(1, n * r + nptr, 64)).astype(np.float32)
    mem_pos = rng.normal(size=(1, n * r + nptr, 64)).astype(np.float32)

    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(curr), jnp.asarray(mem), jnp.asarray(curr_pos),
                jnp.asarray(mem_pos), feat_size=(8, 8), num_obj_ptr_tokens=nptr)
    v = _convert(tm, v)
    ours = jm.apply(v, jnp.asarray(curr), jnp.asarray(mem), jnp.asarray(curr_pos), jnp.asarray(mem_pos),
                    feat_size=(8, 8), num_obj_ptr_tokens=nptr)
    with torch.no_grad():
        # reference runs seq-first and transposes internally (batch_first=True)
        ref = tm(
            torch.from_numpy(curr.transpose(1, 0, 2)),
            torch.from_numpy(mem.transpose(1, 0, 2)),
            curr_pos=torch.from_numpy(curr_pos.transpose(1, 0, 2)),
            memory_pos=torch.from_numpy(mem_pos.transpose(1, 0, 2)),
            num_obj_ptr_tokens=nptr,
        ).numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_multiscale_block_parity():
    """Hiera block with q-pool + dim change + windowing (blocks.py:583)."""
    _load_ref()
    from ultralytics.models.sam.modules.blocks import MultiScaleBlock as TBlock

    torch.manual_seed(0)
    tm = TBlock(dim=32, dim_out=64, num_heads=2, q_stride=(2, 2), window_size=4)
    tm.eval()
    jm = MultiScaleBlock(dim=32, dim_out=64, num_heads=2, q_stride=(2, 2), window_size=4)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 16, 16, 32)).astype(np.float32)
    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = _convert(tm, v)
    ours = jm.apply(v, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # Hiera blocks are already BHWC
    assert ours.shape == ref.shape == (1, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# end-to-end structure
# ---------------------------------------------------------------------------


def test_hiera_encoder_shapes():
    enc = ImageEncoder()  # sam2_t geometry
    x = jnp.zeros((1, 128, 128, 3))
    v = enc.init(jax.random.PRNGKey(0), x)
    feats, pos = enc.apply(v, x)
    assert [f.shape for f in feats] == [(1, 32, 32, 256), (1, 16, 16, 256), (1, 8, 8, 256)]
    assert [p.shape for p in pos] == [(32, 32, 256), (16, 16, 256), (8, 8, 256)]
    assert all(bool(jnp.isfinite(f).all()) for f in feats)


@pytest.mark.slow
def test_sam2_image_predictor():
    import cv2

    img = np.full((96, 120, 3), 60, np.uint8)
    cv2.rectangle(img, (40, 30), (80, 70), (250, 240, 230), -1)
    p = SAM2Predictor(img_size=128)
    p.set_image(img)
    masks, ious = p.prompt(points=[[60, 50]])
    assert masks.shape == (1, 3, 96, 120) and ious.shape == (1, 3)
    assert np.isfinite(ious).all()


@pytest.mark.slow
def test_sam2_video_propagation():
    """3-frame stream with a moving square: the bank fills, scores stay finite,
    and the fixed-shape track program is reused across frames (no recompile)."""
    import cv2

    frames = []
    for t in range(3):
        f = np.full((128, 128, 3), 50, np.uint8)
        x0 = 30 + 10 * t
        cv2.rectangle(f, (x0, 40), (x0 + 40, 80), (245, 235, 225), -1)
        frames.append(f)

    vp = SAM2VideoPredictor(img_size=128)
    mask0, score0 = vp.add_new_points(frames[0], points=[[50, 60]])
    assert mask0.shape == (1, 128, 128) and np.isfinite(score0)
    assert int(np.asarray(vp._bank["mem_valid"]).sum()) == 1

    mask1, score1 = vp.propagate(frames[1])
    mask2, score2 = vp.propagate(frames[2])
    assert mask1.shape == mask2.shape == (1, 128, 128)
    assert np.isfinite([score1, score2]).all()
    # cond slot + two FIFO entries
    assert int(np.asarray(vp._bank["mem_valid"]).sum()) == 3
    assert int(np.asarray(vp._bank["obj_ptr_valid"]).sum()) == 3
    # one compiled track program served both frames
    assert vp._jit_track._cache_size() == 1


def test_sam2_image_encoder_parity():
    """Full sam2_t image encoder (Hiera trunk + FPN neck, scalped) on converted
    torch weights — features AND positional encodings at all 3 levels."""
    _load_ref()
    from ultralytics.models.sam.modules.encoders import (
        FpnNeck as TFpn,
        Hiera as THiera,
        ImageEncoder as TImageEncoder,
    )

    from spectrogram_yolov11_tpu.models.sam2 import sam2_state_preprocess

    torch.manual_seed(0)
    tenc = TImageEncoder(
        trunk=THiera(embed_dim=96, num_heads=1, stages=[1, 2, 7, 2], global_att_blocks=[5, 7, 9],
                     window_pos_embed_bkg_spatial_size=[7, 7], window_spec=[8, 4, 14, 7]),
        neck=TFpn(d_model=256, backbone_channel_list=[768, 384, 192, 96],
                  fpn_top_down_levels=[2, 3], fpn_interp_model="nearest"),
        scalp=1,
    )
    tenc.eval()
    with torch.no_grad():
        # randomize the window pos embed (tiled -> exact) to exercise the
        # NCHW->NHWC conversion path; the background pos embed stays zero
        # because torch bicubic != jax bicubic at ~1e-3 (documented deviation
        # in models/sam2.py Hiera — it only shapes a smooth low-magnitude prior)
        tenc.trunk.pos_embed_window.add_(torch.randn_like(tenc.trunk.pos_embed_window) * 0.02)

    jenc = ImageEncoder()  # sam2_t geometry
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    v = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    state = sam2_state_preprocess({k: p.detach().numpy() for k, p in tenc.state_dict().items()})
    v = load_state_into_variables(dict(v), torch_state_to_variables(state), strict=True)

    feats, pos = jenc.apply(v, jnp.asarray(x))
    with torch.no_grad():
        ref = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(feats[lvl]), ref["backbone_fpn"][lvl].numpy().transpose(0, 2, 3, 1),
            atol=5e-4, err_msg=f"features level {lvl}")
        np.testing.assert_allclose(
            np.asarray(pos[lvl]), ref["vision_pos_enc"][lvl].numpy()[0].transpose(1, 2, 0),
            atol=1e-5, err_msg=f"pos level {lvl}")


def test_sam2_mask_decoder_parity():
    """SAM2MaskDecoder (obj-score token, high-res skips, sigmoid IoU) on
    converted torch weights (decoders.py:176 predict_masks)."""
    _load_ref()
    from ultralytics.models.sam.modules.blocks import SAM2TwoWayTransformer
    from ultralytics.models.sam.modules.decoders import SAM2MaskDecoder as TDec

    from spectrogram_yolov11_tpu.models.sam2 import SAM2MaskDecoder

    torch.manual_seed(1)
    td = 256
    tm = TDec(
        transformer_dim=td,
        transformer=SAM2TwoWayTransformer(depth=2, embedding_dim=td, mlp_dim=2048, num_heads=8),
        use_high_res_features=True, iou_prediction_use_sigmoid=True,
        pred_obj_scores=True, pred_obj_scores_mlp=True, use_multimask_token_for_obj_ptr=True,
    )
    tm.eval()
    jm = SAM2MaskDecoder(td)

    rng = np.random.default_rng(6)
    h = w = 8
    emb = rng.normal(size=(1, h, w, td)).astype(np.float32)
    pe = rng.normal(size=(1, h, w, td)).astype(np.float32)
    sparse = rng.normal(size=(1, 3, td)).astype(np.float32)
    dense = rng.normal(size=(1, h, w, td)).astype(np.float32)
    s0 = rng.normal(size=(1, 4 * h, 4 * w, td // 8)).astype(np.float32)
    s1 = rng.normal(size=(1, 2 * h, 2 * w, td // 4)).astype(np.float32)

    from spectrogram_yolov11_tpu.models.sam2 import sam2_state_preprocess

    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(emb), jnp.asarray(pe), jnp.asarray(sparse),
                jnp.asarray(dense), high_res_features=(jnp.asarray(s0), jnp.asarray(s1)))
    state = sam2_state_preprocess({k: p.detach().numpy() for k, p in tm.state_dict().items()
                                   if not k.startswith(("conv_s0", "conv_s1"))})  # live on SAM2Model here
    v = load_state_into_variables(dict(v), torch_state_to_variables(state), strict=True)

    masks, ious, tokens, obj = jm.apply(v, jnp.asarray(emb), jnp.asarray(pe), jnp.asarray(sparse),
                                        jnp.asarray(dense),
                                        high_res_features=(jnp.asarray(s0), jnp.asarray(s1)))
    t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
    with torch.no_grad():
        r_masks, r_ious, r_tokens, r_obj = tm.predict_masks(
            image_embeddings=t(emb), image_pe=t(pe)[:1],
            sparse_prompt_embeddings=torch.from_numpy(sparse), dense_prompt_embeddings=t(dense),
            repeat_image=False, high_res_features=[t(s0), t(s1)])
    np.testing.assert_allclose(np.asarray(masks), r_masks.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ious), r_ious.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tokens), r_tokens.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(obj), r_obj.numpy(), atol=2e-4)


@pytest.mark.slow
def test_sam2_1_extras_video():
    """sam2.1 extras: spatial no-object memory embedding + projected signed
    temporal pointer encodings (reference build.py:292-294, sam.py:715,818)."""
    import cv2

    from spectrogram_yolov11_tpu.models.sam2 import SAM2

    vp = SAM2("sam2.1_t", video=True, img_size=128)
    assert vp.m.v2_1
    frames = []
    for t in range(2):
        f = np.full((128, 128, 3), 50, np.uint8)
        cv2.rectangle(f, (30 + 10 * t, 40), (70 + 10 * t, 80), (245, 235, 225), -1)
        frames.append(f)
    mask0, s0 = vp.add_new_points(frames[0], points=[[50, 60]])
    mask1, s1 = vp.propagate(frames[1])
    assert np.isfinite([s0, s1]).all() and mask1.shape == (1, 128, 128)
    assert "no_obj_embed_spatial" in vp.variables["params"]


@pytest.mark.slow
def test_sam2_box_prompt():
    """Box prompts map to corner points with labels 2/3 (reference
    SAM2Predictor._prepare_prompts)."""
    import cv2

    img = np.full((96, 120, 3), 60, np.uint8)
    cv2.rectangle(img, (40, 30), (80, 70), (250, 240, 230), -1)
    p = SAM2Predictor(img_size=128)
    p.set_image(img)
    masks, ious = p.prompt(boxes=[[40, 30, 80, 70]])
    assert masks.shape == (1, 3, 96, 120) and np.isfinite(ious).all()
    masks2, _ = p.prompt(points=[[60, 50]], boxes=[[40, 30, 80, 70]], multimask_output=False)
    assert masks2.shape == (1, 1, 96, 120)
