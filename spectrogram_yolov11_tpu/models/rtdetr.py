"""RT-DETR task plug-in: trainer / validator / predictor / facade.

Counterpart of the reference RT-DETR family (/root/reference/ultralytics/
models/rtdetr/: train.py:14 RTDETRTrainer, val.py:53 RTDETRValidator,
predict.py:11 RTDETRPredictor, model.py RTDETR facade).

Deviations (documented, TPU-first):
- data pipeline reuses the letterbox train/val transforms instead of the
  reference's scaleFill stretch — both present the model a square image with
  GT normalized to it; un-scaling uses the recorded ratio_pad. Only the
  aspect presentation differs.
- contrastive denoising uses a static group geometry
  (num_group x dn_max_nums) generated inside the jitted step
  (ops/detr_loss.make_cdn_batch) instead of a batch-max-dependent width.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_yolov11_tpu.engine.predictor import BasePredictor
from spectrogram_yolov11_tpu.engine.trainer import BaseTrainer
from spectrogram_yolov11_tpu.engine.validator import DetectionValidator
from spectrogram_yolov11_tpu.ops.detr_loss import make_cdn_attn_mask, make_cdn_batch, rtdetr_loss


class RTDETRTrainer(BaseTrainer):
    """Trainer wiring for the deformable-decoder detection paradigm."""

    task = "rtdetr"

    # static denoising geometry (reference get_cdn_group: num_dn=100 queries,
    # groups sized by the batch's max GT count — here fixed so every step
    # compiles once)
    dn_max_nums = 32
    dn_num_group = 3  # ~ 100 // 32 rounded up to keep ~200 dn queries
    label_noise_ratio = 0.5
    box_noise_scale = 1.0

    @property
    def num_dn(self) -> int:
        return 2 * self.dn_num_group * self.dn_max_nums

    @property
    def loss_names(self):
        return ["giou_loss", "cls_loss", "l1_loss"]

    def forward_train(self, params, batch_stats, batch, ni):
        nq = min(300, self._num_anchors())
        attn_mask = jnp.asarray(make_cdn_attn_mask(self.num_dn, nq, self.dn_num_group, self.dn_max_nums))
        key = jax.random.fold_in(jax.random.PRNGKey(self.args.seed), ni)
        dn_cls, dn_bbox, dn_valid = make_cdn_batch(
            key, batch["cls"], batch["bboxes"], batch["mask_gt"], nc=self.data["nc"],
            num_group=self.dn_num_group, max_nums=self.dn_max_nums,
            cls_noise_ratio=self.label_noise_ratio, box_noise_scale=self.box_noise_scale,
        )
        from spectrogram_yolov11_tpu.engine.trainer import batch_images

        x = batch_images(batch, self._aug_separable)  # host- OR device-augmented
        out, mut = self.model.graph.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True, mutable=["batch_stats"],
            head_kwargs=dict(dn_cls=dn_cls, dn_bbox=dn_bbox, dn_valid=dn_valid, attn_mask=attn_mask),
        )
        return out, mut["batch_stats"]

    def _num_anchors(self) -> int:
        s = self.imgsz
        return sum((s // k) * (s // k) for k in (8, 16, 32))

    def compute_loss(self, out, batch):
        return rtdetr_loss(
            out, batch["cls"], batch["bboxes"], batch["mask_gt"], nc=self.data["nc"],
            num_dn=self.num_dn, num_group=self.dn_num_group, dn_max_nums=self.dn_max_nums,
        )

    def get_validator(self, ema_vars):
        return RTDETRValidator(
            self.model, ema_vars,
            overrides={"data": self.args.data, "imgsz": self.imgsz, "batch": self.batch_size,
                       "workers": self.args.workers, "plots": False, "single_cls": self.args.single_cls},
        )


class RTDETRValidator(DetectionValidator):
    """NMS-free evaluation (reference: models/rtdetr/val.py:95 postprocess:
    the 300 queries ARE the detections; sort by confidence, no threshold)."""

    task = "rtdetr"

    def _build_device_fn(self):
        model = self.model
        imgsz = self.imgsz

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            y = model.apply(variables, x, train=False)  # (B, nq, 4 + nc)
            boxes, scores = y[..., :4], y[..., 4:]
            conf = scores.max(-1)
            cls = scores.argmax(-1).astype(jnp.float32)
            xy, wh = boxes[..., :2] * imgsz, boxes[..., 2:] * imgsz
            xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
            det = jnp.concatenate([xyxy, conf[..., None], cls[..., None]], axis=-1)  # (B, nq, 6)
            order = jnp.argsort(-conf, axis=1)
            det = jnp.take_along_axis(det, order[..., None], axis=1)
            nv = jnp.full((det.shape[0],), det.shape[1], jnp.int32)
            return det, nv

        return run


class RTDETRPredictor(BasePredictor):
    """Streaming predictor, NMS-free postprocess (reference: predict.py:11):
    the 300 queries are filtered by conf only."""

    def _build_device_fn(self):
        model, args = self.model, self.args
        imgsz = self.imgsz
        conf = float(args.conf)
        classes = None if args.classes is None else jnp.asarray(args.classes)

        @jax.jit
        def run(variables, imgs_u8):
            x = imgs_u8[..., ::-1].astype(jnp.float32) / 255.0  # BGR->RGB on device
            y = model.apply(variables, x, train=False)  # (B, nq, 4+nc)
            boxes, scores = y[..., :4], y[..., 4:]
            sc = scores.max(-1)
            cls = scores.argmax(-1).astype(jnp.float32)
            keep = sc > conf
            if classes is not None:
                keep = keep & jnp.isin(cls, classes.astype(jnp.float32))
            xy, wh = boxes[..., :2] * imgsz, boxes[..., 2:] * imgsz
            xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
            det = jnp.concatenate([xyxy, sc[..., None], cls[..., None]], axis=-1)
            # sort kept-first by masked confidence so rows [:n_valid] are the detections
            order = jnp.argsort(-(sc * keep), axis=1)
            det = jnp.take_along_axis(det, order[..., None], axis=1)
            nv = keep.sum(-1).astype(jnp.int32)
            return det, nv

        return run


class RTDETR:
    """`RTDETR('rtdetr-l.yaml')` facade (reference: models/rtdetr/model.py).

    A thin specialization of the YOLO facade: identical surface, rtdetr task.
    """

    def __new__(cls, model: str = "rtdetr-l.yaml", **kwargs):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        return YOLO(model, task="rtdetr", **kwargs)
