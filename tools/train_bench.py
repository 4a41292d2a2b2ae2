"""Scan-fenced TRAIN-step latency with a per-phase split, for any task.

The training half of the perf story (VERDICT r4 next #1): for each model
config this measures, on the real chip, the prefix programs

    fwd        forward_train only (train=True, batch_stats updates)
    fwd+loss   + TAL assignment + loss (compute_loss)
    fwd+bwd    value_and_grad of the loss (fwd + TAL + backward)
    step       + optimizer (apply_updates) + EMA  == the full train step

each as ONE jitted lax.scan of `reps` iterations with a carried checksum and
a single D2H fence (same methodology as tools/family_bench.py — immune to the
dev tunnel's per-call latency). Train MFU uses the XLA cost_analysis FLOPs of
the FULL step program (actual executed FLOPs, not the 3x-forward heuristic).

Usage:
    python tools/train_bench.py yolo11n.yaml yolo11m.yaml --bs 128
    python tools/train_bench.py yolo11n-seg.yaml --data shapes128-seg.yaml
    python tools/train_bench.py rtdetr-l.yaml --bs 32

Prints one JSON line per (model, bs): phase ms/img + img/s + train MFU.
Reference counterpart for step semantics: reference engine/trainer.py:318
_do_train (fwd / loss / backward / optimizer_step phases of the hot loop).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

PEAK_TFLOPS = 197.0  # TPU v5e bf16 peak

TASK_DATA = {  # default dataset per task (synthetic, zero-egress)
    "detect": "spectrogram_synth.yaml",
    "segment": "shapes128-seg.yaml",
    "pose": "shapes128-pose.yaml",
    "obb": "shapes128-obb.yaml",
}


def _trainer_for(cfg: str, data: str | None, bs: int, imgsz: int, devaug: bool):
    from spectrogram_yolov11_tpu.engine.trainer import (
        DetectionTrainer, OBBTrainer, PoseTrainer, SegmentationTrainer)
    from spectrogram_yolov11_tpu.models.rtdetr import RTDETRTrainer
    from spectrogram_yolov11_tpu.nn.tasks import guess_model_task, yaml_model_load

    task = guess_model_task(yaml_model_load(cfg))
    cls = {"detect": DetectionTrainer, "segment": SegmentationTrainer,
           "pose": PoseTrainer, "obb": OBBTrainer, "rtdetr": RTDETRTrainer}.get(task)
    if cls is None:
        raise SystemExit(f"unsupported task {task!r} for {cfg}")
    data = data or TASK_DATA.get("detect" if task == "rtdetr" else task)
    t = cls(overrides=dict(
        model=cfg, data=data, epochs=1, batch=bs, imgsz=imgsz, amp=True,
        val=False, save=False, plots=False, workers=2, seed=0,
        device_augment=devaug, name=f"trainbench_{Path(cfg).stem}_bs{bs}",
        exist_ok=True))
    t.setup_model()
    return t


def measure(cfg: str, data: str | None, bs: int, imgsz: int, reps: int = 8,
            passes: int = 3, devaug: bool = False, phases=None) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.data.build import DataLoader
    from spectrogram_yolov11_tpu.engine.optim import (
        apply_updates_flat, choose_optimizer, ema_decay, ema_update, flatten_tree,
        init_opt_state_flat, make_flat_spec, param_groups, unflatten_tree)

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    t = _trainer_for(cfg, data, bs, imgsz, devaug)
    ds = t.build_dataset("train", augment=True)
    batch = next(iter(DataLoader(ds, bs, shuffle=True, seed=0, workers=2, drop_last=False)))
    keys = set(t.train_batch_keys) if hasattr(t, "train_batch_keys") else {
        "img", "cls", "bboxes", "mask_gt", "masks", "keypoints", "gt_groups",
        "aug_src", "aug_regions", "aug_pads", "aug_inv", "aug_hsv"}
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()
             if k in keys and hasattr(v, "shape")}
    opt_cfg = choose_optimizer(t.args, t.data["nc"], 100)
    groups = param_groups(t.variables["params"])
    spec = make_flat_spec(t.variables["params"], groups)
    wd = float(t.args.weight_decay)
    state = {
        "params": t.variables["params"],
        "batch_stats": t.variables["batch_stats"],
        "opt": init_opt_state_flat(spec),
        "ema": jax.tree_util.tree_map(lambda x: jnp.array(x, jnp.float32, copy=True), t.variables),
        "upd": jnp.asarray(0, jnp.int32),
    }

    def _leaf_sum(x):
        ls = jax.tree_util.tree_leaves(x)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in ls if hasattr(l, "astype"))

    def loss_fn(p, bstat, b, ni):
        fe, new_bs = t.forward_train(p, bstat, b, ni)
        total, _ = t.compute_loss(fe, b)
        return total, new_bs

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _perturb(b, ni):
        """Iteration-dependent batch: defeats XLA hoisting the (otherwise
        loop-invariant) forward out of the scan for the fwd/loss phases."""
        b = dict(b)
        key = "img" if "img" in b else "aug_src"
        b[key] = b[key].at[(0,) * b[key].ndim].set(ni.astype(b[key].dtype) % 128)
        return b

    # phase prefix programs — each is a (state, batch, ni) -> scalar body
    def body_fwd(st, b, ni):
        fe, _ = t.forward_train(st["params"], st["batch_stats"], _perturb(b, ni), ni)
        return st, _leaf_sum(fe)

    def body_loss(st, b, ni):
        loss, _ = loss_fn(st["params"], st["batch_stats"], _perturb(b, ni), ni)
        return st, loss

    def body_bwd(st, b, ni):
        (loss, new_bs), grads = grad_fn(st["params"], st["batch_stats"], b, ni)
        return {**st, "batch_stats": new_bs}, loss + _leaf_sum(grads)

    def body_opt(st, b, ni):
        # isolated optimizer+EMA phase: params reused as stand-in gradients
        new_p_flat, new_opt = apply_updates_flat(
            flatten_tree(st["params"]), flatten_tree(st["params"]), st["opt"],
            opt_cfg, spec, wd, lr_step=ni)
        new_p = unflatten_tree(new_p_flat, spec)
        d = ema_decay(st["upd"] + 1)
        new_ema = ema_update(st["ema"], {"params": new_p, "batch_stats": st["batch_stats"]}, d)
        return {**st, "params": new_p, "opt": new_opt, "ema": new_ema,
                "upd": st["upd"] + 1}, _leaf_sum(new_p)

    def body_step(st, b, ni):
        # mirrors BaseTrainer._make_train_step: flat-packed optimizer path
        (loss, new_bs), grads = grad_fn(st["params"], st["batch_stats"], b, ni)
        new_p_flat, new_opt = apply_updates_flat(
            flatten_tree(st["params"]), flatten_tree(grads), st["opt"],
            opt_cfg, spec, wd, lr_step=ni)
        new_p = unflatten_tree(new_p_flat, spec)
        d = ema_decay(st["upd"] + 1)
        new_ema = ema_update(st["ema"], {"params": new_p, "batch_stats": new_bs}, d)
        return {"params": new_p, "batch_stats": new_bs, "opt": new_opt,
                "ema": new_ema, "upd": st["upd"] + 1}, loss

    out = {"model": cfg, "imgsz": imgsz, "bs": bs, "devaug": devaug}
    step_fn = None
    all_phases = {"fwd": body_fwd, "fwd_loss": body_loss, "fwd_bwd": body_bwd,
                  "opt_ema": body_opt, "step": body_step}
    wanted = [p for p in (phases or all_phases) if p in all_phases]
    if "step" not in wanted:
        wanted.append("step")
    for name, body in ((n, all_phases[n]) for n in wanted):
        @jax.jit
        def scan_fn(st, b, _body=body):
            def inner(carry, ni):
                st, acc = carry
                st, val = _body(st, b, ni)
                return (st, acc + val), None
            (st, acc), _ = jax.lax.scan(inner, (st, jnp.float32(0.0)), jnp.arange(reps))
            return acc

        assert np.isfinite(float(scan_fn(state, batch))), f"{name} non-finite"
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            float(scan_fn(state, batch))  # true D2H fence
            best = min(best, (time.perf_counter() - t0) / (reps * bs))
        out[f"{name}_ms_img"] = round(best * 1e3, 4)
        if name == "step":
            step_fn = scan_fn
            out["img_per_s"] = round(1.0 / best, 1)
            step_s = best

    # train MFU from the ACTUAL executed FLOPs of ONE step program (the scan
    # program's cost_analysis counts the body once, not reps times)
    one_step = jax.jit(lambda st, b, ni: body_step(st, b, ni)[1])
    cost = one_step.lower(state, batch, jnp.asarray(0, jnp.int32)).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    if cost and cost.get("flops"):
        fl = float(cost["flops"]) / bs
        out["xla_step_gflops_img"] = round(fl / 1e9, 2)
        # NB: this backend's cost_analysis reports ~forward-only flops for the
        # grad program, so ALSO emit the standard 3x-forward convention
        out["train_mfu_xla"] = round((1.0 / step_s) * fl / (PEAK_TFLOPS * 1e12), 4)
        out["train_mfu_3x"] = round((1.0 / step_s) * 3 * fl / (PEAK_TFLOPS * 1e12), 4)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--data", default=None)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--sweep-bs", type=str, default="")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--devaug", action="store_true")
    ap.add_argument("--phases", type=str, default="",
                    help="comma list (fwd,fwd_loss,fwd_bwd,opt_ema,step); "
                         "default all. 'step' alone = 1 compile per config")
    args = ap.parse_args()
    bss = [int(b) for b in args.sweep_bs.split(",") if b] or [args.bs]
    phases = [p for p in args.phases.split(",") if p] or None
    for cfg in args.configs:
        for b in bss:
            print(json.dumps(measure(cfg, args.data, b, args.imgsz, args.reps,
                                     devaug=args.devaug, phases=phases)), flush=True)


if __name__ == "__main__":
    main()
