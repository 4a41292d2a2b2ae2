"""Scan-fenced bare-forward latency for any model config on the real chip.

Produces the per-family rows of ROUND3_NOTES.md's latency table: bf16
forward, `reps` executions inside ONE jitted lax.scan with a carried
checksum (single dispatch + single D2H fence — immune to the dev tunnel's
~50 ms per-call latency; see bench.py HEADLINE rationale). Usage:

    python tools/family_bench.py yolo11l.yaml yolo11x.yaml
    python tools/family_bench.py yolo11n-cls.yaml --imgsz 224 --bs 32

Prints one JSON line per model: {"model", "imgsz", "bs", "ms_per_img",
"img_per_s"}.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


PEAK_TFLOPS = 197.0  # TPU v5e bf16 peak


def measure(cfg: str, imgsz: int, bs: int, reps: int = 16, passes: int = 3, mfu: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.nn.tasks import build_model

    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    model = build_model(cfg, verbose=False, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((bs, imgsz, imgsz, 3), jnp.bfloat16)

    flops_per_img = None
    if mfu:
        lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(variables, x)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        if cost and cost.get("flops"):
            flops_per_img = float(cost["flops"]) / bs

    @jax.jit
    def scan_reps(v, x):
        def body(acc, i):
            xi = x.at[0, 0, 0, 0].set(i.astype(jnp.bfloat16))  # defeat hoisting
            out = model.apply(v, xi, train=False)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
            return acc + s, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return acc

    float(scan_reps(variables, x))  # compile + warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        float(scan_reps(variables, x))  # true D2H fence
        best = min(best, (time.perf_counter() - t0) / (bs * reps))
    out = {
        "model": cfg,
        "imgsz": imgsz,
        "bs": bs,
        "ms_per_img": round(best * 1e3, 3),
        "img_per_s": round(1.0 / best, 1),
    }
    if flops_per_img is not None:
        out["gflops_per_img"] = round(flops_per_img / 1e9, 2)
        out["mfu"] = round((1.0 / best) * flops_per_img / (PEAK_TFLOPS * 1e12), 4)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--sweep-bs", type=str, default="",
                    help="comma list of batch sizes; best row is marked best_bs")
    ap.add_argument("--mfu", action="store_true", help="emit XLA-cost-analysis GFLOPs + measured MFU")
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()
    bss = [int(b) for b in args.sweep_bs.split(",") if b] or [args.bs]
    for cfg in args.configs:
        rows = [measure(cfg, args.imgsz, b, args.reps, mfu=args.mfu) for b in bss]
        best = max(rows, key=lambda r: r["img_per_s"])
        for r in rows:
            if len(rows) > 1:
                r["best_bs"] = r is best
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
