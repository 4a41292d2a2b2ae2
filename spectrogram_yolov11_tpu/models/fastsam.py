"""FastSAM: prompt-able everything-segmentation over the seg stack.

Counterpart of /root/reference/ultralytics/models/fastsam/ (model.py:10
FastSAM facade, predict.py:14 FastSAMPredictor + prompt():106,
utils.py:4 adjust_bboxes_to_image_border, val.py FastSAMValidator).

The architecture IS yolov8-seg with nc=1 (cfg/models/sam/fastsam-s.yaml);
everything-mode runs the ordinary seg predict, then box/point prompts select
masks post-hoc. Text prompts use the offline pseudo-CLIP embedding stub
shared with YOLO-World (documented deviation: the reference runs real CLIP
image/text encoders; swap in cached CLIP tensors for true text prompting).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from spectrogram_yolov11_tpu.engine.predictor import SegmentationPredictor
from spectrogram_yolov11_tpu.engine.validator import SegmentationValidator
from spectrogram_yolov11_tpu.ops.metrics import box_iou_np


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape, threshold: int = 20) -> np.ndarray:
    """Snap near-border boxes to the border (reference: fastsam/utils.py:4)."""
    h, w = image_shape
    boxes = boxes.copy()
    boxes[boxes[:, 0] < threshold, 0] = 0
    boxes[boxes[:, 1] < threshold, 1] = 0
    boxes[boxes[:, 2] > w - threshold, 2] = w
    boxes[boxes[:, 3] > h - threshold, 3] = h
    return boxes


class FastSAMPredictor(SegmentationPredictor):
    """Everything-seg predictor with box/point/text prompt selection
    (reference: fastsam/predict.py:14)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.prompts: dict = {}

    def set_prompts(self, prompts: dict) -> None:
        self.prompts = dict(prompts or {})

    def postprocess(self, out_dev, n_valid, orig_imgs, paths, speed) -> List:
        bboxes = self.prompts.pop("bboxes", None)
        points = self.prompts.pop("points", None)
        labels = self.prompts.pop("labels", None)
        texts = self.prompts.pop("texts", None)
        results = super().postprocess(out_dev, n_valid, orig_imgs, paths, speed)
        for r in results:
            if r.boxes is None or len(r.boxes) == 0:
                continue
            oh, ow = r.orig_shape
            full = np.asarray([[0.0, 0.0, ow, oh]], np.float32)
            snapped = adjust_bboxes_to_image_border(r.boxes.xyxy, r.orig_shape)
            iou = box_iou_np(full, snapped)[0]
            sel = iou > 0.9
            if sel.any():
                r.boxes.data[sel, :4] = full[0]
        return self.prompt(results, bboxes=bboxes, points=points, labels=labels, texts=texts)

    def prompt(self, results, bboxes=None, points=None, labels=None, texts=None):
        """Select masks by prompt cues (reference: fastsam/predict.py:106)."""
        if bboxes is None and points is None and texts is None:
            return results
        out = []
        for r in results if isinstance(results, list) else [results]:
            if len(r) == 0 or r.masks is None:
                out.append(r)
                continue
            masks = self._native_masks(r)
            n = len(r)
            idx = np.zeros(n, bool)
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.int32))
                bbox_areas = (bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0])
                mask_areas = np.stack([masks[:, b[1]: b[3], b[0]: b[2]].sum((1, 2)) for b in bb])
                full_areas = masks.sum((1, 2))
                union = bbox_areas[:, None] + full_areas[None] - mask_areas
                idx[np.argmax(mask_areas / np.maximum(union, 1e-9), axis=1)] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.int32))
                lab = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32)
                assert len(lab) == len(pts), f"labels/points length mismatch: {len(lab)} vs {len(pts)}"
                point_idx = np.ones(n, bool) if lab.sum() == 0 else np.zeros(n, bool)
                for p, l in zip(pts, lab):
                    hits = np.nonzero(masks[:, p[1], p[0]])[0]
                    point_idx[hits] = bool(l)
                idx |= point_idx
            if texts is not None:
                sims = self._text_similarity(r, masks, [texts] if isinstance(texts, str) else list(texts))
                if sims is not None and sims.size:
                    idx[np.argmax(sims, axis=-1)] = True
            out.append(r[idx])
        return out

    def _native_masks(self, r) -> np.ndarray:
        import cv2

        m = r.masks.data
        if m.shape[1:] != tuple(r.orig_shape):
            m = np.stack([cv2.resize(mi.astype(np.uint8), (r.orig_shape[1], r.orig_shape[0]),
                                     interpolation=cv2.INTER_NEAREST) for mi in m])
        return m.astype(bool)

    def _text_similarity(self, r, masks, texts) -> Optional[np.ndarray]:
        """Offline pseudo-CLIP region-text similarity (reference
        _clip_inference runs real CLIP, fastsam/predict.py:123). Image crops
        are embedded by a deterministic pixel-statistics projection and
        compared against the text-hash embedding — a documented stand-in."""
        from spectrogram_yolov11_tpu.nn.tasks import WorldModel

        txt_emb = WorldModel.text_embeddings(texts)[0]  # (M, 512)
        crops = []
        keep_rows = []
        for i, b in enumerate(r.boxes.xyxy.astype(int)):
            if masks[i].sum() <= 100:
                continue
            crop = r.orig_img[b[1]: b[3], b[0]: b[2]]
            if crop.size == 0:
                continue
            stats = np.concatenate([crop.mean((0, 1)), crop.std((0, 1))])
            seed = int(abs(stats).sum() * 1000) % (2**31)
            v = np.random.default_rng(seed).normal(0, 1, 512).astype(np.float32)
            crops.append(v / np.linalg.norm(v))
            keep_rows.append(i)
        if not crops:
            return None
        sims = txt_emb @ np.stack(crops).T  # (M, N_kept)
        full = np.full((len(texts), len(r)), -np.inf, np.float32)
        full[:, keep_rows] = sims
        return full


class FastSAMValidator(SegmentationValidator):
    """Seg validation with FastSAM conventions (reference: fastsam/val.py:12)."""

    task = "segment"


class FastSAM:
    """`FastSAM('fastsam-s.yaml')` facade (reference: fastsam/model.py:10)."""

    def __new__(cls, model: str = "fastsam-s.yaml", **kwargs):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        y = YOLO(model, task="segment", **kwargs)
        y._fastsam = True
        return y
