"""CLIP BPE tokenizer (reference: the CLIP `SimpleTokenizer` used by the
torch fork's WorldTrainer via `clip.tokenize`, reference
models/yolo/world/train.py:24).

Full byte-level BPE implementation. The merge table
(bpe_simple_vocab_16e6.txt.gz) is NOT bundled — this image is zero-egress —
so resolution order is:
  1. explicit path argument / CLIP_BPE_PATH env var,
  2. spectrogram_yolov11_tpu/cfg/clip_bpe.txt.gz if the user drops it there,
  3. deterministic hash-bucket fallback (keeps the pipeline runnable offline;
     token ids are stable but NOT CLIP-compatible — pair with pretrained CLIP
     weights only when a real merge table is supplied).
"""

from __future__ import annotations

import gzip
import hashlib
import os
from functools import lru_cache
from pathlib import Path
from typing import List, Optional

import numpy as np

SOT = 49406  # <|startoftext|>
EOT = 49407  # <|endoftext|>
CTX = 77
_VOCAB = 49408


@lru_cache()
def bytes_to_unicode():
    """GPT-2/CLIP reversible byte <-> unicode mapping."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _find_bpe_path(explicit: Optional[str] = None) -> Optional[Path]:
    for cand in (explicit, os.environ.get("CLIP_BPE_PATH"),
                 Path(__file__).parents[1] / "cfg" / "clip_bpe.txt.gz"):
        if cand and Path(cand).exists():
            return Path(cand)
    return None


class SimpleTokenizer:
    """CLIP's byte-level BPE tokenizer; requires a merge table file."""

    def __init__(self, bpe_path: str | Path):
        self.byte_encoder = bytes_to_unicode()
        merges = gzip.open(bpe_path, "rt", encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}
        try:
            import regex

            self.pat = regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                regex.IGNORECASE,
            )
        except ImportError:  # ASCII approximation
            import re

            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-z]+|[0-9]|[^\sa-z0-9]+""",
                re.IGNORECASE,
            )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = " ".join(text.lower().strip().split())
        ids: List[int] = []
        for tok in self.pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return ids


class HashBucketTokenizer:
    """Offline fallback: deterministic per-word hash buckets into the id
    space below SOT. Stable across runs/processes; NOT CLIP-compatible."""

    def encode(self, text: str, max_id: int = SOT - 1) -> List[int]:
        ids = []
        for w in text.lower().strip().split():
            h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
            ids.append(h % (max_id - 1) + 1)  # avoid 0 pad id
        return ids


_TOKENIZER = None


def get_tokenizer(bpe_path: Optional[str] = None):
    global _TOKENIZER
    if _TOKENIZER is None or bpe_path is not None:
        p = _find_bpe_path(bpe_path)
        _TOKENIZER = SimpleTokenizer(p) if p is not None else HashBucketTokenizer()
    return _TOKENIZER


def tokenize(texts: List[str], ctx_len: int = CTX, bpe_path: Optional[str] = None,
             vocab_size: int = _VOCAB, sot: Optional[int] = None, eot: Optional[int] = None) -> np.ndarray:
    """Texts -> (len(texts), ctx_len) int32, CLIP framing SOT ... EOT pad-0.

    vocab_size/sot/eot let custom-vocab towers (tests, distilled models) keep
    the framing consistent; CLIP defaults (49408/49406/49407) otherwise."""
    sot = (SOT if vocab_size == _VOCAB else vocab_size - 2) if sot is None else sot
    eot = (EOT if vocab_size == _VOCAB else vocab_size - 1) if eot is None else eot
    tk = get_tokenizer(bpe_path)
    out = np.zeros((len(texts), ctx_len), np.int32)
    for i, t in enumerate(texts):
        if isinstance(tk, HashBucketTokenizer):
            body = tk.encode(t, max_id=min(sot, eot) - 1)
        else:
            body = tk.encode(t)
        ids = [sot] + body[: ctx_len - 2] + [eot]
        out[i, : len(ids)] = ids
    return out
