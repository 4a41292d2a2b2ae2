"""Benchmark: end-to-end images/sec/chip (preprocess + inference + NMS) at
640px on yolo11n — the BASELINE.json headline metric.

Mirrors the measurement shape of the reference harness
(/root/reference/ultralytics/utils/benchmarks.py:51 + Results.speed 3-phase
timers, engine/predictor.py:245): host letterbox preprocessing included,
device forward+decode+NMS as one jitted program, steady-state over many
batches with block_until_ready.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline anchors to the published T4-TensorRT10 yolo11n latency of
1.5 ms/img ~= 667 img/s (docs/en/macros/yolo-det-perf.md:3) — which is
inference-only, so parity here is conservative.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.data.augment import letterbox
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.ops.decode import decode_detections
    from spectrogram_yolov11_tpu.ops.nms import non_max_suppression

    imgsz, batch, n_iters, warmup = 640, 32, 30, 5
    model = build_model("yolo11n.yaml", verbose=False, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))
    strides = tuple(float(s) for s in model.stride)

    @jax.jit
    def device_fn(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        feats = model.apply(variables, x, train=False)
        preds = decode_detections(feats, nc=model.nc, strides=strides)
        return non_max_suppression(
            preds, conf_thres=0.25, iou_thres=0.7, nc=model.nc, max_det=300, pre_nms_topk=512
        )

    # realistic-sized source frames (simulate camera/capture input needing letterbox)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8) for _ in range(batch)]

    def preprocess():
        out = np.stack([letterbox(f, (imgsz, imgsz))[0] for f in frames])
        return np.ascontiguousarray(out[..., ::-1])

    # warmup / compile
    host = preprocess()
    for _ in range(warmup):
        out, nv = device_fn(variables, jnp.asarray(host))
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        host = preprocess()
        out, nv = device_fn(variables, jnp.asarray(host))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_iters / dt
    baseline = 667.0  # T4-TRT10 yolo11n, inference-only (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "images/sec/chip e2e (preprocess+infer+NMS) yolo11n 640px bf16 bs32",
                "value": round(imgs_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
