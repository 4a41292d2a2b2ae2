"""Validator: mAP evaluation with the reference's exact protocol.

Counterpart of BaseValidator/DetectionValidator
(/root/reference/ultralytics/engine/validator.py:42,
models/yolo/detect/val.py:17): NMS at conf=0.001, iou=0.7, multi_label=True,
max_det=300 (SURVEY A11); predictions and GT are un-letterboxed to native
image space via the stored ratio_pad before greedy TP matching at 10 IoU
thresholds.

Device work (forward+decode+NMS) is one jitted program; stat accumulation is
host numpy.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_yolov11_tpu.cfg import get_cfg
from spectrogram_yolov11_tpu.data import DataLoader, YOLODataset, check_det_dataset
from spectrogram_yolov11_tpu.ops.decode import decode_detections
from spectrogram_yolov11_tpu.ops.metrics import ConfusionMatrix, DetMetrics, box_iou_np, match_predictions
from spectrogram_yolov11_tpu.ops.nms import non_max_suppression
from spectrogram_yolov11_tpu.utils import DEFAULT_CFG, LOGGER, TQDM


class DetectionValidator:
    def __init__(self, model, variables, overrides: Optional[dict] = None, dataloader: Optional[DataLoader] = None):
        self.model = model
        self.variables = variables
        args = get_cfg(DEFAULT_CFG, overrides or {})
        args.conf = 0.001 if args.conf is None else args.conf
        self.args = args
        self.imgsz = int(args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0])
        self.dataloader = dataloader
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.names = dict(getattr(model, "names", {}))
        self._device_fn = None

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc, strides = model.nc, tuple(float(s) for s in model.stride)

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            feats = model.apply(variables, x, train=False)
            preds = decode_detections(feats, nc=nc, strides=strides)
            return non_max_suppression(
                preds,
                conf_thres=float(args.conf),
                iou_thres=float(args.iou),
                nc=nc,
                multi_label=True,
                agnostic=bool(args.agnostic_nms or args.single_cls),
                max_det=int(args.max_det),
                pre_nms_topk=2048,
            )

        return run

    def get_dataloader(self, data: dict, batch_size: int) -> DataLoader:
        ds = YOLODataset(
            data["val"],
            imgsz=self.imgsz,
            augment=False,
            nc=data["nc"],
            max_gt=256,
            single_cls=self.args.single_cls,
        )
        return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False,
                          workers=self.args.workers, seed=self.args.seed)

    def __call__(self, data: Optional[str | dict] = None) -> Dict[str, float]:
        args = self.args
        if self.dataloader is None:
            d = check_det_dataset(data or args.data)
            self.names = d["names"]
            self.dataloader = self.get_dataloader(d, int(args.batch))
        if self._device_fn is None:
            self._device_fn = self._build_device_fn()

        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        cm = ConfusionMatrix(nc=self.model.nc, conf=args.conf)
        n_img = 0
        t_infer = 0.0
        for batch in TQDM(self.dataloader, desc="val"):
            t0 = time.perf_counter()
            out, nv = self._device_fn(self.variables, jnp.asarray(batch["img"]))
            out = np.asarray(jax.block_until_ready(out))
            nv = np.asarray(nv)
            t_infer += time.perf_counter() - t0
            bsz = int(batch["n_valid"])
            n_img += bsz
            for i in range(bsz):
                n = int(nv[i])
                det = out[i, :n].copy()  # letterbox space xyxy conf cls
                ori_h, ori_w = (int(x) for x in batch["ori_shape"][i])
                ratio, dw, dh = (float(x) for x in batch["ratio_pad"][i])
                # un-letterbox predictions (reference scale_boxes with stored ratio_pad)
                if n:
                    det[:, [0, 2]] -= dw
                    det[:, [1, 3]] -= dh
                    det[:, :4] /= ratio
                    det[:, [0, 2]] = det[:, [0, 2]].clip(0, ori_w)
                    det[:, [1, 3]] = det[:, [1, 3]].clip(0, ori_h)
                # GT: normalized xywh in letterbox space -> native xyxy
                m = batch["mask_gt"][i]
                gt_cls = batch["cls"][i][m].astype(int)
                gxywh = batch["bboxes"][i][m] * self.imgsz
                gxyxy = np.stack(
                    [gxywh[:, 0] - gxywh[:, 2] / 2, gxywh[:, 1] - gxywh[:, 3] / 2,
                     gxywh[:, 0] + gxywh[:, 2] / 2, gxywh[:, 1] + gxywh[:, 3] / 2], axis=1)
                if len(gxyxy):
                    gxyxy[:, [0, 2]] -= dw
                    gxyxy[:, [1, 3]] -= dh
                    gxyxy /= ratio
                stats["target_cls"].append(gt_cls)
                if n == 0:
                    stats["tp"].append(np.zeros((0, 10), bool))
                    stats["conf"].append(np.zeros(0))
                    stats["pred_cls"].append(np.zeros(0))
                    if len(gt_cls) and args.plots:
                        cm.process_batch(None, gxyxy, gt_cls)
                    continue
                iou = box_iou_np(gxyxy, det[:, :4]) if len(gt_cls) else np.zeros((0, n))
                tp = (
                    match_predictions(det[:, 5].astype(int), gt_cls, iou, self.iouv)
                    if len(gt_cls)
                    else np.zeros((n, 10), bool)
                )
                stats["tp"].append(tp)
                stats["conf"].append(det[:, 4])
                stats["pred_cls"].append(det[:, 5])
                if args.plots:
                    cm.process_batch(det, gxyxy, gt_cls)

        metrics = DetMetrics(names=self.names)
        if stats["conf"]:
            metrics.process(
                np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool),
                np.concatenate(stats["conf"]),
                np.concatenate(stats["pred_cls"]),
                np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros(0),
            )
        self.confusion_matrix = cm
        self.metrics = metrics
        mp, mr, map50, map5095 = metrics.mean_results()
        LOGGER.info(
            f"val: {n_img} images  P {mp:.3f}  R {mr:.3f}  mAP50 {map50:.3f}  mAP50-95 {map5095:.3f}"
            f"  ({t_infer / max(n_img, 1) * 1e3:.1f} ms/img device)"
        )
        return metrics.results_dict
