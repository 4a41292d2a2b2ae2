"""CLIP text tower (flax, TPU-native) for YOLO-World / grounding.

Reference behavior: the torch fork encodes class names with CLIP ViT-B/32's
text transformer at `set_classes` time (reference nn/tasks.py:629-716,
models/yolo/world/train.py:24). This is that tower re-implemented in flax —
token + position embeddings, 12 pre-LN residual blocks with causal attention
and quickGELU, final LayerNorm, EOT-token pooling, and the text projection —
with parameter names mirroring the HuggingFace `CLIPTextModelWithProjection`
state_dict so `utils/torch_compat.torch_state_to_variables` converts real
CLIP checkpoints mechanically (parity-tested on random-init torch weights in
tests/test_clip_text.py; this image is zero-egress so pretrained weights are
supplied by the user at deployment).

The whole encode is one jitted program: (B, 77) int32 token ids ->
(B, proj_dim) L2-normalized embeddings. Sequence length is static (77), so
XLA compiles it once; batch B is the only axis that varies.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    """Causal multi-head self-attention, HF CLIPAttention naming."""

    width: int
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, causal_mask):
        B, L, C = x.shape
        hd = C // self.heads
        dense = lambda name: nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("q_proj")(x) * (hd ** -0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        q = q.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
        logits = jnp.where(causal_mask[None, None], logits, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, L, C)
        return dense("out_proj")(out)


class _CLIPEncoderLayer(nn.Module):
    width: int
    heads: int
    mlp_dim: int = 2048
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, causal_mask):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32, name=name)
        h = x + _CLIPAttention(self.width, self.heads, dtype=self.dtype, name="self_attn")(ln("layer_norm1")(x), causal_mask)
        y = ln("layer_norm2")(h)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(quick_gelu(y))
        return h + y


class CLIPTextTransformer(nn.Module):
    """HF CLIPTextModelWithProjection-compatible text tower.

    __call__(input_ids: (B, L) int32) -> dict with
      last_hidden_state (B, L, width), pooled (B, width), embeds (B, proj_dim).
    `embeds` is the projected (NOT normalized) text embedding; callers
    L2-normalize (encode() below does).
    """

    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    ctx_len: int = 77
    proj_dim: int = 512
    mlp_dim: int = 0  # 0 -> 4*width (CLIP default)
    eos_token_id: int = 49407
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_ids):
        tok = self.param("token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.width), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.01), (self.ctx_len, self.width), jnp.float32)
        L = input_ids.shape[1]
        input_ids = jnp.clip(input_ids, 0, self.vocab_size - 1)  # OOV-safe gather
        x = jnp.take(jnp.asarray(tok), input_ids, axis=0) + jnp.asarray(pos)[:L]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        causal = jnp.tril(jnp.ones((L, L), bool))
        mlp_dim = self.mlp_dim or 4 * self.width
        for i in range(self.layers):
            x = _CLIPEncoderLayer(self.width, self.heads, mlp_dim, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, param_dtype=jnp.float32, name="final_layer_norm")(x)
        # EOT pooling: position of the eos token (HF CLIPTextTransformer).
        # Matched on the clamped ids with a clamped eos so OOV-safe framing
        # still pools at the right slot.
        eos_id = min(self.eos_token_id, self.vocab_size - 1)
        eos_pos = jnp.argmax((input_ids == eos_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)[:, 0]
        embeds = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                          name="text_projection")(pooled)
        return {"last_hidden_state": x, "pooled": pooled, "embeds": embeds}


def hf_state_to_variables(state: dict) -> dict:
    """Convert a HuggingFace CLIPTextModelWithProjection state_dict (numpy
    values; torch tensors accepted) to this module's flax variables.

    Handles the two nn.Embedding tables (kept untransposed) and flattens the
    HF scope prefix text_model.encoder.layers.N -> layers_N.
    """
    from spectrogram_yolov11_tpu.utils.torch_compat import torch_state_to_variables

    remapped = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().numpy()
        k = k.replace("text_model.", "").replace("encoder.", "")
        k = k.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
        if k == "embeddings.token_embedding.weight":
            remapped["token_embedding"] = v
            continue
        if k == "embeddings.position_embedding.weight":
            remapped["position_embedding"] = v
            continue
        remapped[k] = v
    direct = {k: remapped.pop(k) for k in ("token_embedding", "position_embedding") if k in remapped}
    out = torch_state_to_variables(remapped)
    out["params"].update({k: np.asarray(v) for k, v in direct.items()})
    return out


def load_clip_encoder(path, **cfg) -> "CLIPTextEncoder":
    """Load a CLIP text tower from disk into a CLIPTextEncoder.

    Accepts: a torch .pt/.bin state_dict of HF CLIPTextModelWithProjection or
    a full CLIPModel (vision keys ignored), a .npz of the same keys, or a
    .ckpt/.msgpack written by engine/checkpoint.save_checkpoint holding the
    flax variables directly.
    """
    from pathlib import Path as _P

    p = _P(path)
    if p.suffix in {".ckpt", ".msgpack"}:
        from spectrogram_yolov11_tpu.engine.checkpoint import load_checkpoint

        tree, _meta = load_checkpoint(p)
        return CLIPTextEncoder(variables=tree.get("variables", tree), **cfg)
    if p.suffix == ".npz":
        state = dict(np.load(p))
    else:  # torch pickle
        import torch

        obj = torch.load(p, map_location="cpu", weights_only=True)
        state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    state = {k: v for k, v in state.items() if not k.startswith(("vision_model.", "visual.", "logit_scale"))}

    # infer architecture from the state shapes (heads is not inferable; CLIP
    # uses width/64 heads on every published text tower)
    def _shape(key):
        for k, v in state.items():
            if k.endswith(key):
                return tuple(v.shape)
        return None

    tok = _shape("token_embedding.weight")
    pos = _shape("position_embedding.weight")
    fc1 = _shape("layers.0.mlp.fc1.weight")
    proj = _shape("text_projection.weight")
    n_layers = len({k.split("layers.")[1].split(".")[0] for k in state if "layers." in k})
    if tok:
        cfg.setdefault("vocab_size", tok[0])
        cfg.setdefault("width", tok[1])
        cfg.setdefault("heads", max(tok[1] // 64, 1))
        cfg.setdefault("eos_token_id", tok[0] - 1)  # CLIP convention: eot is the last id
    if pos:
        cfg.setdefault("ctx_len", pos[0])
    if fc1:
        cfg.setdefault("mlp_dim", fc1[0])
    if proj:
        cfg.setdefault("proj_dim", proj[0])
    if n_layers:
        cfg.setdefault("layers", n_layers)
    return CLIPTextEncoder.from_hf_state(state, **cfg)


class CLIPTextEncoder:
    """User-facing text encoder: tokenizer + jitted tower -> unit embeddings.

    weights: optional path to a converted checkpoint (msgpack via
    engine/checkpoint.py) or an HF state_dict already in memory. Without
    weights the tower is random-init — architecture-true but semantically
    untrained (this zero-egress image cannot download CLIP); WorldModel then
    prefers its deterministic hash fallback unless `allow_random=True`.
    """

    def __init__(self, variables: Optional[dict] = None, dtype=None, **cfg):
        self.model = CLIPTextTransformer(dtype=dtype, **cfg)
        self.variables = variables
        self._jit = jax.jit(lambda v, ids: self.model.apply(v, ids)["embeds"])

    @classmethod
    def from_hf_state(cls, state: dict, **cfg) -> "CLIPTextEncoder":
        return cls(variables=hf_state_to_variables(state), **cfg)

    def init_random(self, seed: int = 0) -> "CLIPTextEncoder":
        self.variables = self.model.init(jax.random.PRNGKey(seed), jnp.zeros((1, self.model.ctx_len), jnp.int32))
        return self

    def encode_ids(self, input_ids: np.ndarray) -> np.ndarray:
        """(B, ctx_len) int token ids -> (B, proj_dim) L2-normalized."""
        if self.variables is None:
            self.init_random()
        e = np.asarray(self._jit(self.variables, jnp.asarray(input_ids, jnp.int32)))
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    def encode(self, texts) -> np.ndarray:
        """List of strings -> (K, proj_dim) unit embeddings via the BPE
        tokenizer (utils/clip_tokenizer.py)."""
        from spectrogram_yolov11_tpu.utils.clip_tokenizer import tokenize

        return self.encode_ids(tokenize(list(texts), ctx_len=self.model.ctx_len,
                                        vocab_size=self.model.vocab_size, eot=self.model.eos_token_id))
