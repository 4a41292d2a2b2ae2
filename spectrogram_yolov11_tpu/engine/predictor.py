"""Predictor: streaming inference over any source, one fused device program.

Counterpart of the reference BasePredictor (engine/predictor.py:66,
stream_inference:222). TPU-first shape: the entire device pipeline —
uint8->float normalize, forward, DFL decode, NMS — is ONE jitted function
with static shapes; the host only letterboxes (cv2) and slices fixed-shape
outputs to n_valid. Images H2D-transfer as uint8 (4x less PCIe/ICI traffic
than float32).

Deviation from the reference: predict always letterboxes to a fixed square
imgsz (no dynamic stride-rect batches) — XLA recompiles per shape, so one
static shape is the TPU-correct choice.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_yolov11_tpu.cfg import get_cfg, get_save_dir
from spectrogram_yolov11_tpu.data.loaders import load_inference_source
from spectrogram_yolov11_tpu.engine.results import Results
from spectrogram_yolov11_tpu.ops.boxes import scale_boxes
from spectrogram_yolov11_tpu.ops.decode import decode_detections, decode_kpts, decode_obb, feat_shapes
from spectrogram_yolov11_tpu.ops.nms import non_max_suppression, non_max_suppression_extras, nms_rotated
from spectrogram_yolov11_tpu.utils import LOGGER, DEFAULT_CFG


def _norm_on_device(imgs_u8_bgr):
    """BGR->RGB + /255 on device (free XLA fusions; keeps H2D payload uint8 BGR
    straight from the native letterboxer). A single-channel payload — gray
    spectrogram frames ship one channel over the (slow) host link and
    broadcast back here, bit-identical to the replicated upload."""
    if imgs_u8_bgr.shape[-1] == 1:
        imgs_u8_bgr = jnp.broadcast_to(imgs_u8_bgr, (*imgs_u8_bgr.shape[:-1], 3))
    return imgs_u8_bgr[..., ::-1].astype(jnp.float32) / 255.0


def _maybe_gray(batch: np.ndarray, state: list | None = None) -> np.ndarray:
    """Ship one channel when the batch is gray-replicated BGR (the fork's
    spectrogram frames are): 3x less H2D for identical results.

    Gray batches are fully verified before slicing (correctness-critical);
    genuinely-RGB sources pay only a tiny strided pixel probe, and once a
    stream is seen RGB the sticky `state` cache skips even that (per-stream
    list cell: None=unknown, False=RGB-for-good)."""
    if batch.ndim != 4 or batch.shape[-1] != 3:
        return batch
    if state is not None and state[0] is False:
        return batch
    probe = batch[:, ::97, ::89]  # O(B*50*8) sample; any mismatch -> RGB, skip full scan
    if not (np.array_equal(probe[..., 0], probe[..., 1]) and np.array_equal(probe[..., 0], probe[..., 2])):
        if state is not None:
            state[0] = False
        return batch
    if np.array_equal(batch[..., 0], batch[..., 1]) and np.array_equal(batch[..., 0], batch[..., 2]):
        return np.ascontiguousarray(batch[..., :1])
    if state is not None:
        state[0] = False
    return batch


class BasePredictor:
    """Detection predictor; subclasses adjust postprocess for other tasks."""

    def __init__(self, model, variables, overrides: Optional[dict] = None):
        # Deploy-time RepConv re-parameterization (reference AutoBackend
        # fuses on load, nn/autobackend.py:146): exact algebra, returns the
        # input pair untouched for graphs without RepConvs. The facade's
        # model/variables stay in train form — only this predictor holds the
        # fused copy.
        if hasattr(model, "graph") and isinstance(variables, dict):
            # EnsemblePredictor passes a TUPLE of per-member variable trees
            # and fuses each member itself before calling up (ADVICE r3).
            from spectrogram_yolov11_tpu.nn.tasks import fuse_model

            model, variables = fuse_model(model, variables)
        self.model = model
        self.variables = variables
        args = get_cfg(DEFAULT_CFG, overrides or {})
        if args.conf is None:
            args.conf = 0.25
        self.args = args
        if args.half and hasattr(model, "set_dtype"):
            # bf16 serving — the TPU-native fast path (2x the f32 plateau,
            # bench.py); reference half=True maps to fp16 (predictor.py:118)
            model.set_dtype(jnp.bfloat16)
        self.imgsz = int(args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0])
        self.batch_size = 1
        self.names = getattr(model, "names", {})
        self._device_fn = None
        self.done_warmup = False
        # user/event callbacks (reference engine/predictor.py runs
        # on_predict_{start,batch_start,postprocess_end,batch_end,end});
        # YOLO._merge_callbacks forwards facade-registered hooks here
        self.callbacks: dict = {}

    # -- device program -------------------------------------------------
    def _build_device_fn(self):
        model, args = self.model, self.args
        nc = model.nc
        strides = tuple(float(s) for s in model.stride)
        conf, iou, max_det = float(args.conf), float(args.iou), int(args.max_det)
        classes = None if args.classes is None else jnp.asarray(args.classes)

        if getattr(model, "end2end", False):
            from spectrogram_yolov11_tpu.ops.decode import decode_e2e, nms_free_postprocess

            @jax.jit
            def run_e2e(variables, imgs_u8):
                x = _norm_on_device(imgs_u8)
                out = model.apply(variables, x, train=False)
                preds = decode_e2e(out["one2one"], nc=nc, strides=strides)
                det = nms_free_postprocess(preds, max_det, nc)
                keep = det[..., 4] > conf
                if classes is not None:
                    keep = keep & jnp.isin(det[..., 5], classes.astype(det.dtype))
                    order = jnp.argsort(~keep, axis=1, stable=True)  # kept rows first, conf order kept
                    det = jnp.take_along_axis(det, order[..., None], axis=1)
                nv = keep.sum(-1).astype(jnp.int32)
                return det, nv

            return run_e2e

        nms_kw = dict(conf_thres=conf, iou_thres=iou, nc=nc, multi_label=False,
                      agnostic=bool(args.agnostic_nms), max_det=max_det, classes=classes,
                      pre_nms_topk=int(getattr(args, 'pre_nms_topk', 0) or 0) or 1024)

        if getattr(args, "augment", False):
            import math

            gs = int(max(strides))

            @jax.jit
            def run_tta(variables, imgs_u8):
                """TTA: scales (1, .83, .67) + lr-flip on the middle scale, all
                inside ONE program (reference tasks.py:377 _predict_augment,
                torch_utils.py:423 scale_img); tails clipped per
                _clip_augmented (drop P5 of the 1.0 pass, P3 of the .67 pass)."""
                x = _norm_on_device(imgs_u8)
                B, S = x.shape[0], x.shape[1]
                merged = []
                for si, flip in ((1.0, False), (0.83, True), (0.67, False)):
                    xi = x[:, :, ::-1] if flip else x
                    if si != 1.0:
                        s_new = int(S * si)
                        pad_to = math.ceil(S * si / gs) * gs
                        xi = jax.image.resize(xi, (B, s_new, s_new, 3), method="bilinear")
                        xi = jnp.pad(xi, ((0, 0), (0, pad_to - s_new), (0, pad_to - s_new), (0, 0)),
                                     constant_values=0.447)  # imagenet-mean gray (scale_img)
                    feats = model.apply(variables, xi, train=False)
                    p = decode_detections(feats, nc=nc, strides=strides)
                    # de-scale boxes back to the original frame, then de-flip x
                    # (reference _descale_pred: /=scale first, img_size[1]-x after)
                    p = p.at[..., :4].divide(si)
                    if flip:
                        p = p.at[..., 0].set(S - p[..., 0])
                    # per-level anchor counts for tail clipping
                    counts = [h * w for (h, w) in feat_shapes(feats)]
                    if si == 1.0:
                        p = p[:, : counts[0] + counts[1]]  # drop P5 tail
                    elif si == 0.67:
                        p = p[:, counts[0]:]  # drop P3 head
                    merged.append(p)
                preds = jnp.concatenate(merged, axis=1)
                return non_max_suppression(preds, **nms_kw)

            return run_tta

        @jax.jit
        def run(variables, imgs_u8):
            x = _norm_on_device(imgs_u8)
            feats = model.apply(variables, x, train=False)
            preds = decode_detections(feats, nc=nc, strides=strides)
            return non_max_suppression(preds, **nms_kw)

        return run

    def warmup(self, batch_size: int = 1):
        if self._device_fn is None:
            self._device_fn = self._build_device_fn()
        dummy = jnp.zeros((batch_size, self.imgsz, self.imgsz, 3), jnp.uint8)
        jax.block_until_ready(self._device_fn(self.variables, dummy))
        self.batch_size = batch_size
        self.done_warmup = True

    def _visualize_features(self, batch: np.ndarray) -> None:
        """visualize=True: save per-stage feature-map grids for the first batch
        (reference predictor.py visualize -> plotting.py:1347). Uses flax
        capture_intermediates on an unjitted forward — a debugging path, so
        compile cost is deliberately avoided."""
        from spectrogram_yolov11_tpu.cfg import get_save_dir
        from spectrogram_yolov11_tpu.utils.plotting import feature_visualization

        self._visualized = True
        save_dir = get_save_dir(self.args) / "features"
        x = jnp.asarray(batch[:1])
        if x.shape[-1] == 1:
            x = jnp.broadcast_to(x, (*x.shape[:-1], 3))
        x = x[..., ::-1].astype(jnp.float32) / 255.0
        try:
            _, state = self.model.graph.apply(
                self.variables, x, train=False, capture_intermediates=True, mutable=["intermediates"])
            inter = state["intermediates"]
            for stage, (name, node) in enumerate(sorted(inter.items())):
                out = node.get("__call__", [None])[0] if isinstance(node, dict) else None
                if out is None or not hasattr(out, "ndim"):
                    continue
                arr = out[0] if isinstance(out, (tuple, list)) else out
                if getattr(arr, "ndim", 0) == 4:
                    feature_visualization(np.asarray(arr), name, stage, save_dir=save_dir)
            LOGGER.info(f"feature maps saved to {save_dir}")
        except Exception as e:  # visualization must never fail inference
            LOGGER.warning(f"visualize=True failed: {e}")

    # -- host pipeline ---------------------------------------------------
    def preprocess(self, imgs: List[np.ndarray]) -> np.ndarray:
        """Native (C++) batch letterbox into a persistent buffer; stays uint8
        BGR (reference: predictor.py:118). BGR->RGB + /255 happen on device."""
        from spectrogram_yolov11_tpu.utils.native import NativeBatchLetterbox

        n = len(imgs)
        if getattr(self, "_lb", None) is None or self._lb.buf.shape[0] != n or self._lb.imgsz != self.imgsz:
            self._lb = NativeBatchLetterbox(n, self.imgsz)
        buf, _ = self._lb(imgs)
        return buf

    def postprocess(self, out_dev, n_valid, orig_imgs, paths, speed) -> List[Results]:
        results = []
        out_np = np.asarray(out_dev)
        for i, (img0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            det = out_np[i, :n].copy()
            if n:
                det[:, :4] = scale_boxes((self.imgsz, self.imgsz), det[:, :4], img0.shape[:2])
            results.append(Results(img0, path, self.names, boxes=det, speed=speed))
        return results

    def stream_inference(self, source, batch_size: int = 1) -> Iterator[Results]:
        from spectrogram_yolov11_tpu.utils.callbacks import run_callbacks

        if self._device_fn is None or batch_size != self.batch_size:
            self._device_fn = self._build_device_fn()
            self.warmup(batch_size)
        run_callbacks(self.callbacks, "on_predict_start", self)
        loader = load_inference_source(source, vid_stride=self.args.vid_stride)
        self._loader = loader  # save path reads fps_map for VideoWriter
        gray_state = [None]
        buf_imgs, buf_paths = [], []

        def flush():
            nonlocal buf_imgs, buf_paths
            if not buf_imgs:
                return
            run_callbacks(self.callbacks, "on_predict_batch_start", self)
            t0 = time.perf_counter()
            n_real = len(buf_imgs)
            imgs = buf_imgs + [buf_imgs[-1]] * (batch_size - n_real)
            batch = _maybe_gray(self.preprocess(imgs), gray_state)
            if getattr(self.args, "visualize", False) and not getattr(self, "_visualized", False):
                self._visualize_features(batch)
            t1 = time.perf_counter()
            out, nv = self._device_fn(self.variables, jnp.asarray(batch))
            out = jax.block_until_ready(out)
            t2 = time.perf_counter()
            speed = {
                "preprocess": (t1 - t0) / n_real * 1e3,
                "inference": (t2 - t1) / n_real * 1e3,
                "postprocess": 0.0,
            }
            res = self.postprocess(out, np.asarray(nv), buf_imgs[:n_real], buf_paths[:n_real], speed)
            self.results = res  # visible to on_predict_* hooks (reference predictor.results)
            run_callbacks(self.callbacks, "on_predict_postprocess_end", self)
            buf_imgs, buf_paths = [], []
            yield from res
            run_callbacks(self.callbacks, "on_predict_batch_end", self)

        for path, img, _ in loader:
            buf_imgs.append(img)
            buf_paths.append(path)
            if len(buf_imgs) == batch_size:
                yield from flush()
        yield from flush()
        run_callbacks(self.callbacks, "on_predict_end", self)

    def __call__(self, source, stream: bool = False, batch_size: int = 1, **kwargs):
        gen = self.stream_inference(source, batch_size=batch_size)
        if stream:
            return gen
        results = list(gen)
        if self.args.save or self.args.save_txt or self.args.save_crop:
            import cv2

            from spectrogram_yolov11_tpu.data.loaders import VID_FORMATS

            save_dir = get_save_dir(self.args)
            save_dir.mkdir(parents=True, exist_ok=True)
            plot_kw = dict(line_width=self.args.line_width, show_conf=bool(self.args.show_conf),
                           show_labels=bool(self.args.show_labels))
            writers: dict = {}
            frame_idx: dict = {}
            for r in results:
                p = Path(r.path)
                stem = p.stem or "image"
                is_video = p.suffix[1:].lower() in VID_FORMATS
                k = frame_idx[str(p)] = frame_idx.get(str(p), -1) + 1
                if self.args.save:
                    if is_video:  # annotated video (reference predictor save_preds)
                        frame = r.plot(**plot_kw)
                        wr = writers.get(str(p))
                        if wr is None:
                            fps_map = getattr(getattr(self, "_loader", None), "fps_map", None) or {}
                            wr = writers[str(p)] = cv2.VideoWriter(
                                str(save_dir / f"{stem}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                                fps_map.get(str(p), 30), (frame.shape[1], frame.shape[0]))
                        wr.write(frame)
                        if self.args.save_frames:
                            (save_dir / f"{stem}_frames").mkdir(exist_ok=True)
                            cv2.imwrite(str(save_dir / f"{stem}_frames" / f"{k}.jpg"), frame)
                    else:
                        r.save(save_dir / f"{stem}.jpg", **plot_kw)
                if self.args.save_txt:
                    sfx = f"_{k}" if is_video else ""
                    r.save_txt(save_dir / "labels" / f"{stem}{sfx}.txt", save_conf=self.args.save_conf)
                if self.args.save_crop:
                    r.save_crop(save_dir / "crops", f"{stem}{f'_{k}' if is_video else ''}.jpg")
            for wr in writers.values():
                wr.release()
            LOGGER.info(f"Results saved to {save_dir}")
        return results


class SegmentationPredictor(BasePredictor):
    """Detect + mask decode (reference: models/yolo/segment/predict.py)."""

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc = model.nc
        strides = tuple(float(s) for s in model.stride)
        conf, iou, max_det = float(args.conf), float(args.iou), int(args.max_det)

        @jax.jit
        def run(variables, imgs_u8):
            x = _norm_on_device(imgs_u8)
            feats, mc, proto = model.apply(variables, x, train=False)
            preds = decode_detections(feats, nc=nc, strides=strides)
            preds = jnp.concatenate([preds, mc], axis=-1)  # carry coeffs through NMS select
            out, nv = non_max_suppression_extras(preds, conf_thres=conf, iou_thres=iou, nc=nc, max_det=max_det)
            # out: (B, max_det, 6 + nm); masks: sigmoid(coeff @ proto) CROPPED
            # to each box (reference process_mask, ops.py:679)
            from spectrogram_yolov11_tpu.ops.masks import crop_masks_device

            coeff = out[..., 6:]
            masks = jax.nn.sigmoid(jnp.einsum("bdk,bhwk->bdhw", coeff, proto))
            masks = crop_masks_device(masks, out[..., :4], (x.shape[1], x.shape[2]))
            return out[..., :6], nv, masks

        return run

    def postprocess(self, out_dev, n_valid, orig_imgs, paths, speed):
        out, nv, masks = out_dev
        results = []
        out_np, masks_np = np.asarray(out), np.asarray(masks)
        import cv2

        for i, (img0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            det = out_np[i, :n].copy()
            mk = None
            if n:
                boxes_lb = det[:, :4].copy()  # letterbox space, for mask crop
                det[:, :4] = scale_boxes((self.imgsz, self.imgsz), det[:, :4], img0.shape[:2])
                h0, w0 = img0.shape[:2]
                mk = np.zeros((n, h0, w0), bool)
                for j in range(n):
                    m = cv2.resize(masks_np[i, j], (self.imgsz, self.imgsz))
                    # un-letterbox the mask
                    gain = min(self.imgsz / h0, self.imgsz / w0)
                    pw, ph = (self.imgsz - w0 * gain) / 2, (self.imgsz - h0 * gain) / 2
                    m = m[int(round(ph - 0.1)) : self.imgsz - int(round(ph + 0.1)),
                          int(round(pw - 0.1)) : self.imgsz - int(round(pw + 0.1))]
                    m = cv2.resize(m, (w0, h0)) > 0.5
                    # crop to box
                    x1, y1, x2, y2 = det[j, :4].astype(int)
                    full = np.zeros_like(m)
                    full[max(y1, 0) : y2, max(x1, 0) : x2] = m[max(y1, 0) : y2, max(x1, 0) : x2]
                    mk[j] = full
            results.append(Results(img0, path, self.names, boxes=det, masks=mk, speed=speed))
        return results

    def stream_inference(self, source, batch_size: int = 1):
        from spectrogram_yolov11_tpu.utils.callbacks import run_callbacks

        if self._device_fn is None:
            self._device_fn = self._build_device_fn()
        run_callbacks(self.callbacks, "on_predict_start", self)
        loader = load_inference_source(source, vid_stride=self.args.vid_stride)
        self._loader = loader
        gray_state = [None]
        for path, img, _ in loader:
            run_callbacks(self.callbacks, "on_predict_batch_start", self)
            t0 = time.perf_counter()
            batch = _maybe_gray(self.preprocess([img]), gray_state)
            out = self._device_fn(self.variables, jnp.asarray(batch))
            out = jax.block_until_ready(out)
            speed = {"preprocess": 0.0, "inference": (time.perf_counter() - t0) * 1e3, "postprocess": 0.0}
            res = self.postprocess((out[0], np.asarray(out[1]), out[2]), np.asarray(out[1]), [img], [path], speed)
            self.results = res
            run_callbacks(self.callbacks, "on_predict_postprocess_end", self)
            yield from res
            run_callbacks(self.callbacks, "on_predict_batch_end", self)
        run_callbacks(self.callbacks, "on_predict_end", self)


class EnsemblePredictor(BasePredictor):
    """NMS-ensemble over multiple detect models (reference nn/tasks.py:718
    Ensemble + attempt_load_weights): every member's decoded predictions
    concatenate along the anchor axis into ONE NMS — all members run inside
    the same jitted program, so XLA schedules them back to back on device.
    Members may differ in architecture but must share nc."""

    def __init__(self, members, overrides=None):
        from spectrogram_yolov11_tpu.nn.tasks import fuse_model

        # deploy-time RepConv fuse per member (BasePredictor skips the fuse
        # for the tuple-of-variables it receives from here)
        members = [fuse_model(m, v) if hasattr(m, "graph") else (m, v) for m, v in members]
        models = [m for m, _ in members]
        assert len({m.nc for m in models}) == 1, "ensemble members must share nc"
        super().__init__(models[0], tuple(v for _, v in members), overrides)
        if self.args.half:
            for m in models[1:]:  # member 0 handled by BasePredictor
                if hasattr(m, "set_dtype"):
                    m.set_dtype(jnp.bfloat16)
        self._members = models

    def _build_device_fn(self):
        models, args = self._members, self.args
        nc = models[0].nc
        conf, iou, max_det = float(args.conf), float(args.iou), int(args.max_det)
        classes = None if args.classes is None else jnp.asarray(args.classes)

        @jax.jit
        def run(all_variables, imgs_u8):
            x = _norm_on_device(imgs_u8)
            preds = [
                decode_detections(m.apply(v, x, train=False), nc=nc,
                                  strides=tuple(float(s) for s in m.stride))
                for m, v in zip(models, all_variables)
            ]
            return non_max_suppression(
                jnp.concatenate(preds, axis=1), conf_thres=conf, iou_thres=iou, nc=nc,
                multi_label=False, agnostic=bool(args.agnostic_nms), max_det=max_det, classes=classes)

        return run


class ClassificationPredictor(BasePredictor):
    def _build_device_fn(self):
        model = self.model

        @jax.jit
        def run(variables, imgs_u8):
            x = _norm_on_device(imgs_u8)
            logits = model.apply(variables, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        return run

    def preprocess(self, imgs):
        import cv2

        out = np.stack([cv2.resize(im, (self.imgsz, self.imgsz)) for im in imgs])
        return np.ascontiguousarray(out[..., ::-1])

    def stream_inference(self, source, batch_size: int = 1):
        from spectrogram_yolov11_tpu.utils.callbacks import run_callbacks

        if self._device_fn is None:
            self._device_fn = self._build_device_fn()
        run_callbacks(self.callbacks, "on_predict_start", self)
        loader = load_inference_source(source, vid_stride=self.args.vid_stride)
        for path, img, _ in loader:
            run_callbacks(self.callbacks, "on_predict_batch_start", self)
            probs = np.asarray(self._device_fn(self.variables, jnp.asarray(self.preprocess([img]))))[0]
            res = Results(img, path, self.names, probs=probs)
            self.results = [res]
            run_callbacks(self.callbacks, "on_predict_postprocess_end", self)
            yield res
            run_callbacks(self.callbacks, "on_predict_batch_end", self)
        run_callbacks(self.callbacks, "on_predict_end", self)


class PosePredictor(BasePredictor):
    """Detect + keypoints (reference: models/yolo/pose/predict.py)."""

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc = model.nc
        strides = tuple(float(s) for s in model.stride)
        nk, nd = getattr(model, "kpt_shape", (17, 3))

        @jax.jit
        def run(variables, imgs_u8):
            x = _norm_on_device(imgs_u8)
            feats, kpt_raw = model.apply(variables, x, train=False)
            shapes = feat_shapes(feats)
            kpts = decode_kpts(kpt_raw, (nk, nd), shapes, strides)
            preds = decode_detections(feats, nc=nc, strides=strides)
            preds = jnp.concatenate([preds, kpts.reshape(kpts.shape[0], kpts.shape[1], -1)], axis=-1)
            return non_max_suppression_extras(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                max_det=int(args.max_det),
            )

        return run

    def postprocess(self, out_dev, n_valid, orig_imgs, paths, speed):
        nk, nd_ = getattr(self.model, "kpt_shape", (17, 3))
        results = []
        out_np = np.asarray(out_dev)
        for i, (img0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            det = out_np[i, :n, :6].copy()
            nd = out_np.shape[-1] - 6
            kpts = out_np[i, :n, 6:].reshape(n, nk, nd // nk).copy()
            if n:
                gain = min(self.imgsz / img0.shape[0], self.imgsz / img0.shape[1])
                pw = round((self.imgsz - img0.shape[1] * gain) / 2 - 0.1)
                ph = round((self.imgsz - img0.shape[0] * gain) / 2 - 0.1)
                det[:, :4] = scale_boxes((self.imgsz, self.imgsz), det[:, :4], img0.shape[:2])
                kpts[..., 0] = (kpts[..., 0] - pw) / gain
                kpts[..., 1] = (kpts[..., 1] - ph) / gain
            results.append(Results(img0, path, self.names, boxes=det, keypoints=kpts, speed=speed))
        return results


class OBBPredictor(BasePredictor):
    """Oriented boxes (reference: models/yolo/obb/predict.py)."""

    def _build_device_fn(self):
        model, args = self.model, self.args
        nc = model.nc
        strides = tuple(float(s) for s in model.stride)

        @jax.jit
        def run(variables, imgs_u8):
            x = _norm_on_device(imgs_u8)
            feats, angle_raw = model.apply(variables, x, train=False)
            preds = decode_obb(feats, angle_raw, nc=nc, strides=strides)
            return nms_rotated(
                preds, conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                max_det=int(args.max_det),
            )

        return run

    def postprocess(self, out_dev, n_valid, orig_imgs, paths, speed):
        results = []
        out_np = np.asarray(out_dev)
        for i, (img0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            det = out_np[i, :n].copy()  # (n, 7) cx cy w h angle conf cls
            if n:
                gain = min(self.imgsz / img0.shape[0], self.imgsz / img0.shape[1])
                pw = round((self.imgsz - img0.shape[1] * gain) / 2 - 0.1)
                ph = round((self.imgsz - img0.shape[0] * gain) / 2 - 0.1)
                det[:, 0] = (det[:, 0] - pw) / gain
                det[:, 1] = (det[:, 1] - ph) / gain
                det[:, 2:4] /= gain
            results.append(Results(img0, path, self.names, obb=det, speed=speed))
        return results
