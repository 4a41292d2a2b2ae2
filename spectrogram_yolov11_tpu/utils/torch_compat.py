"""torch checkpoint ingestion: state_dict -> flax variables.

The reference ships .pt checkpoints (pickled torch Modules); our runtime is
torch-free. This module converts a torch state_dict (dict of numpy arrays)
into our {params, batch_stats} pytree by mechanical key translation — module
attribute names in nn/modules/* were chosen to mirror the torch originals so
the mapping needs no per-module tables:

  torch "model.10.m.0.attn.qkv.conv.weight"
      -> params["model_10"]["m_0"]["attn"]["qkv"]["conv"]["kernel"] (OIHW->HWIO)

torch itself is an *optional* dependency used only inside import_pt().
Reference checkpoint schema: /root/reference/ultralytics/engine/trainer.py:512.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER

# heads whose torch cv2/cv3 branches live in a nested `detect` submodule here
_NESTED_DETECT_TASKS = {"segment", "pose", "obb"}


def translate_key(key: str) -> Tuple[str, ...]:
    """'model.23.cv3.0.0.0.conv.weight' -> ('model_23','cv3_0_0_0','conv','weight').

    Consecutive numeric tokens merge into the preceding name token — this is
    exactly how Sequential/ModuleList indices flatten into our explicit
    attribute names.
    """
    out: list[str] = []
    for tok in key.split("."):
        if tok.isdigit() and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(tok)
    return tuple(out)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_to_variables(
    state: Dict[str, np.ndarray],
    head_layer: Optional[str] = None,
    head_task: str = "detect",
) -> dict:
    """Convert a torch state_dict (numpy values) to flax variables.

    head_layer: name like 'model_23' whose cv2/cv3/cv4 keys need the nested
    'detect' scope inserted when head_task is segment/pose/obb.
    """
    params: dict = {}
    stats: dict = {}
    for key, val in state.items():
        path = list(translate_key(key))
        leaf = path[-1]
        if leaf == "num_batches_tracked":
            continue
        if len(path) >= 2 and path[-2] == "dfl" or (len(path) >= 3 and path[-3] == "dfl"):
            continue  # frozen DFL projection is a pure function here
        # nest detect branches for composite heads
        if (
            head_task in _NESTED_DETECT_TASKS
            and head_layer is not None
            and path[0] == head_layer
            and len(path) > 1
            and (path[1].startswith("cv2_") or path[1].startswith("cv3_"))
        ):
            path.insert(1, "detect")

        # nn.Embedding tables (RT-DETR denoising/tgt embeds, SAM tokens): keep
        # (num, dim) untransposed; our modules declare them as direct leaf params
        _EMBEDS = {"denoising_class_embed", "tgt_embed", "not_a_point_embed", "no_mask_embed",
                   "iou_token", "mask_tokens", "obj_ptr_tokens", "obj_score_token"}
        if leaf == "weight" and len(path) >= 2 and (
            path[-2] in _EMBEDS or path[-2].startswith("point_embeddings")
        ):
            _set(params, tuple(path[:-1]), val)
            continue

        is_bn = len(path) >= 2 and (path[-2] == "bn" or path[-2].startswith("bn_") or leaf in {"running_mean", "running_var"})
        if leaf == "running_mean":
            _set(stats, tuple(path[:-1] + ["mean"]), val)
        elif leaf == "running_var":
            _set(stats, tuple(path[:-1] + ["var"]), val)
        elif leaf == "weight":
            if val.ndim == 4:  # conv OIHW -> HWIO
                # transposed convs are identified by module name
                if path[-2] in {"upsample", "conv_transpose"}:
                    # torch ConvTranspose2d weight: (in, out, kh, kw) -> flax
                    # transpose_kernel=True expects (kh, kw, out, in)
                    _set(params, tuple(path[:-1] + ["kernel"]), val.transpose(2, 3, 1, 0))
                else:
                    _set(params, tuple(path[:-1] + ["kernel"]), val.transpose(2, 3, 1, 0))
            elif val.ndim == 2:  # linear (O, I) -> (I, O)
                _set(params, tuple(path[:-1] + ["kernel"]), val.transpose(1, 0))
            elif val.ndim == 1 and is_bn:  # bn gamma
                _set(params, tuple(path[:-1] + ["scale"]), val)
            else:  # LayerNorm/GroupNorm gamma etc.
                _set(params, tuple(path[:-1] + ["scale"]), val)
        elif leaf == "bias":
            _set(params, tuple(path[:-1] + ["bias"]), val)
        else:  # plain tensor parameter (e.g. Fusion fusion weights, implicit params)
            _set(params, tuple(path), val)
    return {"params": params, "batch_stats": stats}


def _tree_paths(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def load_state_into_variables(variables: dict, converted: dict, strict: bool = True) -> dict:
    """Graft converted torch weights onto an init'd variables tree (shape-checked).

    Returns a NEW tree with the same structure as `variables`. Raises on any
    shape mismatch; on missing/extra keys raises when strict else warns.
    """
    import jax

    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy of leaves
    problems = []
    have_params = set(_tree_paths(out.get("params", {})))
    for coll in ("params", "batch_stats"):
        have = _tree_paths(out.get(coll, {}))
        want = _tree_paths(converted.get(coll, {}))
        missing = set(have) - set(want)
        extra = set(want) - set(have)
        # Dead reference leaves (declared-but-unused submodules, trained only
        # by weight decay) legitimately have no destination here:
        # - HCoordAtt declares conv1+bn1 but forwards through cv1 only
        #   (reference conv.py:1646-1648); sibling check runs against the
        #   params collection so bn1 BATCH_STATS are dropped too.
        # - SAKAM declares channel_attention = ECAAttention(c1) it never calls
        #   (reference conv.py:1338,1359-1360 commented out); our SAKAM keeps
        #   the live pool->fc gate ('fc' sibling).
        def _parent_has(p, cut, name):
            return any(q[:cut] == p[:cut] and len(q) > cut and q[cut] == name
                       for q in have_params)

        dead = set()
        for p in extra:
            if len(p) >= 2 and p[-2] in {"conv1", "bn1"} and _parent_has(p, len(p) - 2, "cv1"):
                dead.add(p)
            elif "channel_attention" in p and _parent_has(p, p.index("channel_attention"), "fc"):
                dead.add(p)
        if dead:
            extra -= dead
            LOGGER.info(
                f"{coll}: dropped {len(dead)} dead reference leaves "
                "(declared-but-unused submodules: HCoordAtt conv1/bn1, SAKAM channel_attention)"
            )
        if missing:
            problems.append(f"{coll}: {len(missing)} un-filled leaves, e.g. {sorted(missing)[:3]}")
        if extra:
            problems.append(f"{coll}: {len(extra)} unmatched torch leaves, e.g. {sorted(extra)[:3]}")
        for path in set(have) & set(want):
            tv, jv = want[path], have[path]
            if tuple(tv.shape) != tuple(jv.shape):
                problems.append(f"{coll}/{'/'.join(path)}: torch {tv.shape} vs ours {jv.shape}")
                continue
            node = out[coll]
            for p in path[:-1]:
                node = node[p]
            node[path[-1]] = np.asarray(tv, dtype=np.float32)
    if problems:
        msg = "torch weight conversion problems:\n  " + "\n  ".join(problems[:20])
        if strict:
            raise ValueError(msg)
        LOGGER.warning(msg)
    return out


def import_pt(weights: str | Path) -> Tuple[Dict[str, np.ndarray], dict]:
    """Load a reference .pt checkpoint -> (state_dict numpy, metadata).

    Requires torch (and, for full pickles, the reference package on sys.path —
    tests use tests/oracle.py for that). Returns the EMA weights when present,
    matching the reference resume/eval semantics (trainer.py:512: 'ema' holds
    the weights, 'model' is None in training checkpoints).
    """
    import torch

    ckpt = torch.load(str(weights), map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") or ckpt.get("model")
        meta = {k: v for k, v in ckpt.items() if k in {"epoch", "best_fitness", "train_args", "date", "version"}}
    else:
        model = ckpt
    if hasattr(model, "state_dict"):
        sd = model.state_dict()
        meta["yaml"] = getattr(model, "yaml", None)
        meta["nc"] = getattr(model, "nc", None)
        meta["names"] = getattr(model, "names", None)
        meta["args"] = dict(getattr(model, "args", {}) or {})
    else:
        sd = model
    state = {k: v.float().cpu().numpy() for k, v in sd.items()}
    return state, meta
