"""Benchmark: end-to-end images/sec/chip (preprocess + inference + NMS) at
640px on yolo11n — the BASELINE.json headline metric.

Mirrors the measurement shape of the reference harness
(/root/reference/ultralytics/utils/benchmarks.py:51 + Results.speed 3-phase
timers, engine/predictor.py:245): host letterbox preprocessing of 720p BGR
frames included, device program = pad+normalize+forward+DFL-decode+NMS as one
jitted bf16 executable, blocking per batch (true per-batch latency, no
pipelining tricks in the measurement).

TPU-first engineering (mirrored in engine/predictor.py):
- host does ONLY the aspect-preserving resize, written straight into a
  preallocated buffer (this rig has a single host core: copies are the enemy);
- letterbox 114-padding, BGR->RGB and /255 happen on device (free XLA fusions);
- the H2D payload is the resized pixels only (690 KB/img uint8), and batch
  size is chosen to keep each transfer under the tunnel's ~6 MB fast-path
  cliff (>8 MB messages drop from ~830 MB/s to ~150 MB/s sustained).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline anchors to the published T4-TensorRT10 yolo11n latency of
1.5 ms/img ~= 667 img/s (docs/en/macros/yolo-det-perf.md:3), inference-only —
so beating it end-to-end is a strict win.
"""

from __future__ import annotations

import json
import time

import cv2
import numpy as np

IMGSZ = 640
BATCH = 8  # 5.5 MB/transfer: under the tunnel's fast-path message-size cliff
SRC_H, SRC_W = 720, 1280
N_ITERS, WARMUP = 60, 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.ops.decode import decode_detections
    from spectrogram_yolov11_tpu.ops.nms import non_max_suppression

    # letterbox geometry for the (fixed-size source) bench frames
    r = min(IMGSZ / SRC_H, IMGSZ / SRC_W)
    nh, nw = int(round(SRC_H * r)), int(round(SRC_W * r))
    top = int(round((IMGSZ - nh) / 2 - 0.1))
    left = int(round((IMGSZ - nw) / 2 - 0.1))

    model = build_model("yolo11n.yaml", verbose=False, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))
    strides = tuple(float(s) for s in model.stride)

    @jax.jit
    def device_fn(variables, imgs_small_bgr):
        x = jnp.pad(
            imgs_small_bgr,
            ((0, 0), (top, IMGSZ - top - nh), (left, IMGSZ - left - nw), (0, 0)),
            constant_values=114,
        )
        x = x[..., ::-1].astype(jnp.float32) / 255.0  # BGR->RGB + normalize on device
        feats = model.apply(variables, x, train=False)
        preds = decode_detections(feats, nc=model.nc, strides=strides)
        return non_max_suppression(
            preds, conf_thres=0.25, iou_thres=0.7, nc=model.nc, max_det=300, pre_nms_topk=512
        )

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (SRC_H, SRC_W, 3), dtype=np.uint8) for _ in range(BATCH)]
    buf = np.empty((BATCH, nh, nw, 3), np.uint8)

    def preprocess() -> np.ndarray:
        for i, f in enumerate(frames):
            cv2.resize(f, (nw, nh), dst=buf[i], interpolation=cv2.INTER_LINEAR)
        return buf

    for _ in range(WARMUP):
        out = device_fn(variables, preprocess())
    jax.block_until_ready(out)

    times = []
    for _ in range(N_ITERS):
        t0 = time.perf_counter()
        out = device_fn(variables, preprocess())
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    # steady-state throughput from the median per-batch latency: this host
    # shares CPU with the TPU tunnel and shows sporadic multi-100ms stall
    # windows unrelated to the pipeline under test
    imgs_per_sec = BATCH / float(np.median(times))
    baseline = 667.0  # T4-TRT10 yolo11n, inference-only (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "images/sec/chip e2e (preprocess+infer+NMS) yolo11n 640px bf16 bs8",
                "value": round(imgs_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
