"""CLIP text tower parity vs HuggingFace CLIPTextModelWithProjection on
random-init weights (reference: nn/tasks.py:629-716 encodes class names with
CLIP; this image is zero-egress so the oracle is architecture parity — the
converter then makes real checkpoints drop in at deployment)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from spectrogram_yolov11_tpu.nn.modules.clip_text import (  # noqa: E402
    CLIPTextEncoder,
    CLIPTextTransformer,
    hf_state_to_variables,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(0)
    # tiny config: full algorithm, small tensors (CPU test budget)
    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=256, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=32, projection_dim=48,
        eos_token_id=999, bos_token_id=998, hidden_act="quick_gelu",
    )
    m = CLIPTextModelWithProjection(cfg)
    m.eval()
    return m, cfg


def _ids(cfg, b=3, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    L = cfg.max_position_embeddings
    ids = rng.integers(1, cfg.vocab_size - 10, (b, L))
    ids[:, 0] = cfg.bos_token_id
    lens = rng.integers(4, L - 1, b)
    for i, n in enumerate(lens):
        ids[i, n] = cfg.eos_token_id
        ids[i, n + 1 :] = 0
    return ids.astype(np.int64)


def test_clip_text_parity(hf_model):
    m, cfg = hf_model
    ids = _ids(cfg)
    with torch.no_grad():
        # HF applies a causal mask over the full padded length, same as ours
        out = m(input_ids=torch.from_numpy(ids))
    ref_embeds = out.text_embeds.numpy()
    ref_hidden = out.last_hidden_state.numpy()

    fx = CLIPTextTransformer(
        vocab_size=cfg.vocab_size, width=cfg.hidden_size, layers=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads, ctx_len=cfg.max_position_embeddings,
        proj_dim=cfg.projection_dim, eos_token_id=cfg.eos_token_id,
    )
    v = hf_state_to_variables({k: p for k, p in m.state_dict().items()})
    got = jax.jit(lambda ids: fx.apply(v, ids))(jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got["last_hidden_state"]), ref_hidden, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["embeds"]), ref_embeds, atol=2e-5, rtol=1e-4)


def test_clip_encoder_normalized(hf_model):
    m, cfg = hf_model
    enc = CLIPTextEncoder(
        variables=hf_state_to_variables(m.state_dict()),
        vocab_size=cfg.vocab_size, width=cfg.hidden_size, layers=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads, ctx_len=cfg.max_position_embeddings,
        proj_dim=cfg.projection_dim, eos_token_id=cfg.eos_token_id,
    )
    e = enc.encode_ids(_ids(cfg, b=2))
    assert e.shape == (2, cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)


def test_tokenizer_framing():
    from spectrogram_yolov11_tpu.utils import clip_tokenizer as ct

    ids = ct.tokenize(["a photo of an LTE burst", "rf"], ctx_len=16)
    assert ids.shape == (2, 16) and ids.dtype == np.int32
    assert (ids[:, 0] == ct.SOT).all()
    for row in ids:
        assert ct.EOT in row
        e = int(np.argmax(row == ct.EOT))
        assert (row[e + 1 :] == 0).all()
    # deterministic across calls
    np.testing.assert_array_equal(ids, ct.tokenize(["a photo of an LTE burst", "rf"], ctx_len=16))


def test_bpe_tokenizer_roundtrip(tmp_path):
    """Full BPE path with a tiny synthetic merge table."""
    import gzip

    from spectrogram_yolov11_tpu.utils.clip_tokenizer import SimpleTokenizer, bytes_to_unicode

    merges = ["#version: tiny", "l t", "lt e</w>", "r f</w>"]
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    tk = SimpleTokenizer(p)
    ids = tk.encode("lte rf")
    assert ids == [tk.encoder["lte</w>"], tk.encoder["rf</w>"]]
    # unknown word falls back to char-level tokens, all in vocab
    assert all(i in tk.encoder.values() for i in tk.encode("zq"))


def test_load_clip_encoder_infers_arch(tmp_path, hf_model, monkeypatch):
    """load_clip_encoder infers width/layers/mlp/proj/ctx from the state dict
    and WorldModel.text_embeddings switches from the hash stub to CLIP."""
    import spectrogram_yolov11_tpu.nn.tasks as T
    from spectrogram_yolov11_tpu.nn.modules.clip_text import load_clip_encoder

    m, cfg = hf_model
    p = tmp_path / "clip_text.pt"
    torch.save(m.state_dict(), str(p))
    enc = load_clip_encoder(p, heads=cfg.num_attention_heads)
    assert enc.model.width == cfg.hidden_size
    assert enc.model.layers == cfg.num_hidden_layers
    assert enc.model.mlp_dim == cfg.intermediate_size
    assert enc.model.proj_dim == cfg.projection_dim
    assert enc.model.ctx_len == cfg.max_position_embeddings

    # WorldModel path: env var + fresh cache -> CLIP embeddings (unit norm,
    # deterministic, distinct per class)
    monkeypatch.setenv("SYT_CLIP_WEIGHTS", str(p))
    monkeypatch.setattr(T, "_CLIP_TEXT_ENCODER", T._UNSET)
    import spectrogram_yolov11_tpu.nn.modules.clip_text as C

    monkeypatch.setattr(C, "load_clip_encoder", lambda path: load_clip_encoder(path, heads=cfg.num_attention_heads))
    e = T.WorldModel.text_embeddings(["person", "lte burst"])
    assert e.shape == (1, 2, cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)
    assert not np.allclose(e[0, 0], e[0, 1])
    np.testing.assert_allclose(e, T.WorldModel.text_embeddings(["person", "lte burst"]))
    monkeypatch.setattr(T, "_CLIP_TEXT_ENCODER", T._UNSET)  # don't leak into other tests
