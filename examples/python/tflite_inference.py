"""Standalone TFLite inference: run an exported .tflite artifact with ONLY
the LiteRT interpreter + numpy — no framework import on the inference path.

Counterpart of the reference's TFLite example
(/root/reference/examples/YOLOv8-TFLite-Python/main.py): letterbox, invoke,
decode, NMS and drawing all live in this file so the script works on a
deployment box where only `tensorflow` (or `tflite_runtime`) is installed.

The artifact comes from the framework's exporter:

    from spectrogram_yolov11_tpu import YOLO
    YOLO("runs_artifacts/spectrogram_yolo11n.ckpt").export(format="tflite")

Detect graphs output (B, A, 4+nc): xywh boxes in letterboxed-input pixels +
sigmoid class scores (engine/exporter.py build_inference_fn). For segment /
pose graphs pass --nc so the score slice stops before the coeff/kpt tail
(mask/kpt decoding stays in the framework's AutoBackend; like the
reference's TFLite example, this standalone runner draws boxes).

Usage:
    python tflite_inference.py --model model.tflite --source image.png \
        --conf 0.25 --iou 0.45 --save out.png
"""

from __future__ import annotations

import argparse

import numpy as np

try:  # pragma: no cover - environment-dependent import
    from tflite_runtime.interpreter import Interpreter
except ImportError:
    import tensorflow as tf

    Interpreter = tf.lite.Interpreter


def letterbox_u8(img: np.ndarray, size: int) -> tuple[np.ndarray, float, tuple[float, float]]:
    """Aspect-preserving resize + 114-pad to (size, size); returns (out, gain,
    (padw, padh)) for unscaling (same geometry as the framework's LetterBox)."""
    import cv2

    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    dw, dh = (size - nw) / 2, (size - nh) / 2
    if (nh, nw) != (h, w):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return out, r, (dw, dh)


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> list[int]:
    """Greedy IoU NMS over xyxy boxes (descending-score order)."""
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a[i] + a[order[1:]] - inter + 1e-9)
        order = order[1:][iou <= iou_thres]
    return keep


def postprocess(preds: np.ndarray, conf: float, iou: float,
                gain: float, pad: tuple[float, float], orig_hw: tuple[int, int],
                nc: int = 0) -> np.ndarray:
    """(A, 4+nc[+extras]) xywh+scores -> (n, 6) [x1, y1, x2, y2, conf, cls] in
    original image coords (class-offset NMS like the framework's
    non_max_suppression). nc>0 bounds the score slice for graphs that append
    mask coeffs / keypoints after the class scores."""
    xywh = preds[:, :4]
    scores = preds[:, 4:4 + nc] if nc else preds[:, 4:]
    cls = scores.argmax(-1)
    cmax = scores.max(-1)
    m = cmax >= conf
    if not m.any():
        return np.zeros((0, 6), np.float32)
    xywh, cls, cmax = xywh[m], cls[m], cmax[m]
    xyxy = np.stack([xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
                     xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2], 1)
    # class offset so one NMS pass stays class-aware
    off = cls.astype(np.float32)[:, None] * 7680.0
    keep = nms_numpy(xyxy + off, cmax, iou)
    xyxy, cmax, cls = xyxy[keep], cmax[keep], cls[keep]
    xyxy[:, [0, 2]] = (xyxy[:, [0, 2]] - pad[0]) / gain
    xyxy[:, [1, 3]] = (xyxy[:, [1, 3]] - pad[1]) / gain
    xyxy[:, [0, 2]] = xyxy[:, [0, 2]].clip(0, orig_hw[1])
    xyxy[:, [1, 3]] = xyxy[:, [1, 3]].clip(0, orig_hw[0])
    return np.concatenate([xyxy, cmax[:, None], cls[:, None].astype(np.float32)], 1)


class TFLiteYOLO:
    """Minimal standalone runner for exported detect/segment .tflite graphs."""

    def __init__(self, model_path: str, conf: float = 0.25, iou: float = 0.45, nc: int = 0):
        self.interp = Interpreter(model_path=model_path)
        self.interp.allocate_tensors()
        self.inp = self.interp.get_input_details()[0]
        self.outs = self.interp.get_output_details()
        self.size = int(self.inp["shape"][1])
        self.conf, self.iou, self.nc = conf, iou, nc

    def __call__(self, img_bgr: np.ndarray) -> dict:
        lb, gain, pad = letterbox_u8(img_bgr, self.size)
        x = lb[None, ..., ::-1].astype(np.float32)  # BGR -> RGB, raw 0-255 pixels
        if self.inp["dtype"] == np.int8:  # int8-calibrated export: q = x/scale + zp
            s, z = self.inp["quantization"]
            x = np.clip(np.round(x / s + z), -128, 127).astype(np.int8)
        else:
            x = x.astype(self.inp["dtype"])
        self.interp.set_tensor(self.inp["index"], x)
        self.interp.invoke()
        raw = []
        for o in self.outs:
            r = self.interp.get_tensor(o["index"])
            if o["dtype"] == np.int8:
                s, z = o["quantization"]
                r = (r.astype(np.float32) - z) * s
            raw.append(r)
        # detect: one (1, A, 4+nc) output; segment: + (1, A, nm) coeffs, (1, H, W, nm) proto
        preds = max(raw, key=lambda r: (r.ndim == 3, r.shape[-1] if r.ndim == 3 else 0))
        det = postprocess(preds[0], self.conf, self.iou, gain, pad, img_bgr.shape[:2], nc=self.nc)
        return {"det": det, "raw": raw}


def main() -> None:
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--nc", type=int, default=0, help="class count for segment/pose graphs")
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    img = cv2.imread(args.source)
    runner = TFLiteYOLO(args.model, args.conf, args.iou, nc=args.nc)
    det = runner(img)["det"]
    for x1, y1, x2, y2, c, k in det:
        print(f"class {int(k)}  conf {c:.3f}  box ({x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f})")
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 2)
        cv2.putText(img, f"{int(k)} {c:.2f}", (int(x1), int(y1) - 4), 0, 0.6, (0, 255, 0), 2)
    if args.save:
        cv2.imwrite(args.save, img)
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
