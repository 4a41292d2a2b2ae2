"""Standalone instance-segmentation inference: run an exported segment
.tflite artifact with ONLY the LiteRT interpreter + numpy/cv2 — no framework
import on the inference path.

Counterpart of the reference's segmentation example
(/root/reference/examples/YOLOv8-Segmentation-ONNXRuntime-Python/main.py:14
`YOLOv8Seg`): preprocess, NMS, the full mask pipeline (proto @ coeff ->
sigmoid -> box-crop -> un-letterbox upsample -> contours) and drawing all
live in this file so the script runs on a deployment box where only
`tensorflow` (or `tflite_runtime`) is installed.

The artifact comes from the framework's exporter (nms=False segment graph:
preds (B, A, 4+nc+nm) + proto (B, H/4, W/4, nm) — engine/exporter.py
build_inference_fn):

    from spectrogram_yolov11_tpu import YOLO
    YOLO("yolo11n-seg.yaml").export(format="tflite")

Usage:
    python segmentation_inference.py --model model.tflite --source img.png \
        --nc 80 --conf 0.25 --iou 0.45 --save out.png
"""

from __future__ import annotations

import argparse

import numpy as np

from tflite_inference import letterbox_u8, nms_numpy


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def crop_mask_np(masks: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Zero every mask pixel outside its box (N, H, W) x (N, 4 xyxy in mask
    coords) — the arange trick the framework uses in ops/losses.py:184."""
    n, h, w = masks.shape
    r = np.arange(w, dtype=np.float32)[None, None, :]
    c = np.arange(h, dtype=np.float32)[None, :, None]
    x1, y1, x2, y2 = (boxes[:, i].reshape(-1, 1, 1) for i in range(4))
    return masks * ((r >= x1) & (r < x2) & (c >= y1) & (c < y2))


def process_mask_np(proto: np.ndarray, coeffs: np.ndarray, boxes_xyxy: np.ndarray,
                    lb_hw: tuple[int, int], gain: float, pad: tuple[float, float],
                    orig_hw: tuple[int, int]) -> np.ndarray:
    """proto (mh, mw, nm) + coeffs (n, nm) + letterboxed-space boxes -> boolean
    masks (n, H0, W0) in original-image space. Mirrors the framework's
    postprocess (exporter einsum + Results mask unscale) and the reference's
    `process_mask`/`scale_mask` (main.py:207,230)."""
    import cv2

    mh, mw, _ = proto.shape
    masks = sigmoid(coeffs @ proto.reshape(-1, proto.shape[-1]).T).reshape(-1, mh, mw)
    # crop in proto coords (letterbox -> proto scale factor)
    sx, sy = mw / lb_hw[1], mh / lb_hw[0]
    boxes_m = boxes_xyxy * np.array([sx, sy, sx, sy], np.float32)
    masks = crop_mask_np(masks, boxes_m)
    # un-letterbox: cut the pad region out of the proto plane, then resize
    top, left = int(round(pad[1] * sy - 0.1)), int(round(pad[0] * sx - 0.1))
    bottom, right = mh - int(round(pad[1] * sy + 0.1)), mw - int(round(pad[0] * sx + 0.1))
    out = np.zeros((len(masks), orig_hw[0], orig_hw[1]), np.float32)
    for i, m in enumerate(masks):
        m = m[top:bottom, left:right]
        out[i] = cv2.resize(m, (orig_hw[1], orig_hw[0]), interpolation=cv2.INTER_LINEAR)
    return out > 0.5


def masks2segments_np(masks: np.ndarray) -> list[np.ndarray]:
    """Boolean masks -> largest-contour polygon per instance (reference
    main.py:167)."""
    import cv2

    segments = []
    for m in masks.astype(np.uint8):
        cnts, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if cnts:
            seg = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
        else:
            seg = np.zeros((0, 2), np.float32)
        segments.append(seg)
    return segments


def postprocess_seg(preds: np.ndarray, proto: np.ndarray, conf: float, iou: float, nc: int,
                    lb_hw: tuple[int, int], gain: float, pad: tuple[float, float],
                    orig_hw: tuple[int, int]) -> tuple[np.ndarray, np.ndarray]:
    """(A, 4+nc+nm) + (mh, mw, nm) -> ((n, 6) det in original coords,
    (n, H0, W0) boolean masks)."""
    xywh, scores, coeffs = preds[:, :4], preds[:, 4:4 + nc], preds[:, 4 + nc:]
    cls = scores.argmax(-1)
    cmax = scores.max(-1)
    m = cmax >= conf
    if not m.any():
        return np.zeros((0, 6), np.float32), np.zeros((0, *orig_hw), bool)
    xywh, cls, cmax, coeffs = xywh[m], cls[m], cmax[m], coeffs[m]
    xyxy = np.stack([xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
                     xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2], 1)
    keep = nms_numpy(xyxy + cls.astype(np.float32)[:, None] * 7680.0, cmax, iou)
    xyxy, cmax, cls, coeffs = xyxy[keep], cmax[keep], cls[keep], coeffs[keep]
    masks = process_mask_np(proto, coeffs, xyxy, lb_hw, gain, pad, orig_hw)
    # boxes to original coords
    xyxy[:, [0, 2]] = ((xyxy[:, [0, 2]] - pad[0]) / gain).clip(0, orig_hw[1])
    xyxy[:, [1, 3]] = ((xyxy[:, [1, 3]] - pad[1]) / gain).clip(0, orig_hw[0])
    det = np.concatenate([xyxy, cmax[:, None], cls[:, None].astype(np.float32)], 1)
    return det, masks


class TFLiteYOLOSeg:
    """Minimal standalone runner for exported segment .tflite graphs."""

    def __init__(self, model_path: str, nc: int, conf: float = 0.25, iou: float = 0.45):
        try:  # pragma: no cover - environment-dependent import
            from tflite_runtime.interpreter import Interpreter
        except ImportError:
            import tensorflow as tf

            Interpreter = tf.lite.Interpreter
        self.interp = Interpreter(model_path=model_path)
        self.interp.allocate_tensors()
        self.inp = self.interp.get_input_details()[0]
        self.outs = self.interp.get_output_details()
        self.size = int(self.inp["shape"][1])
        self.nc, self.conf, self.iou = nc, conf, iou

    def __call__(self, img_bgr: np.ndarray) -> dict:
        lb, gain, pad = letterbox_u8(img_bgr, self.size)
        x = lb[None, ..., ::-1].astype(self.inp["dtype"])
        self.interp.set_tensor(self.inp["index"], x)
        self.interp.invoke()
        raw = [self.interp.get_tensor(o["index"]) for o in self.outs]
        # preds is the rank-3 tensor, proto the rank-4 one
        preds = next(r for r in raw if r.ndim == 3)[0]
        proto = next(r for r in raw if r.ndim == 4)[0]
        det, masks = postprocess_seg(preds, proto, self.conf, self.iou, self.nc,
                                     (self.size, self.size), gain, pad, img_bgr.shape[:2])
        return {"det": det, "masks": masks, "segments": masks2segments_np(masks)}


def main() -> None:
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--nc", type=int, required=True, help="class count of the exported model")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    img = cv2.imread(args.source)
    out = TFLiteYOLOSeg(args.model, args.nc, args.conf, args.iou)(img)
    rng = np.random.default_rng(3)
    for (x1, y1, x2, y2, c, k), seg in zip(out["det"], out["segments"]):
        color = tuple(int(v) for v in rng.integers(64, 255, 3))
        print(f"class {int(k)}  conf {c:.3f}  box ({x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f})  "
              f"segment {len(seg)} pts")
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, 2)
        if len(seg):
            cv2.polylines(img, [seg.astype(np.int32)], True, color, 2)
    if args.save:
        cv2.imwrite(args.save, img)
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
