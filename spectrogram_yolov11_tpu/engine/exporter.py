"""Exporter: serialize models for deployment.

Counterpart of the reference 13-format Exporter (engine/exporter.py:185,
format table at :5-22). TPU-native format set (availability-gated like the
reference's lazy per-format deps):

| format      | produces                       | consumer                        |
|-------------|--------------------------------|---------------------------------|
| ckpt        | .ckpt msgpack checkpoint       | this framework (AutoBackend)    |
| stablehlo   | .stablehlo MLIR + .ckpt        | XLA AOT runtimes (incl. C++)    |
| saved_model | TF SavedModel via jax2tf       | TF Serving (needs tensorflow)   |
| tflite      | .tflite via jax2tf+converter   | LiteRT (needs tensorflow)       |
| onnx        | .onnx via tf2onnx              | ONNX Runtime (needs tf2onnx)    |

`nms=True` embeds decode+NMS into the exported graph (the reference's
NMSModel wrapper, exporter.py:1525, is our default device pipeline anyway).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.cfg import get_cfg, get_save_dir
from spectrogram_yolov11_tpu.ops.decode import decode_detections, feat_shapes
from spectrogram_yolov11_tpu.ops.nms import non_max_suppression
from spectrogram_yolov11_tpu.utils import DEFAULT_CFG, LOGGER


def export_formats() -> dict:
    """Capability matrix (reference: exporter.py:110)."""
    import importlib.util

    tf_ok = importlib.util.find_spec("tensorflow") is not None
    return {
        "ckpt": {"suffix": ".ckpt", "available": True},
        "stablehlo": {"suffix": ".stablehlo", "available": True},
        # TF-chain formats are availability-gated like the reference's lazy
        # per-format deps; exercised by tests/test_export_backend.py
        # (saved_model + tflite fp/int8) wherever tensorflow is installed
        "saved_model": {"suffix": "_saved_model", "available": tf_ok},
        "tflite": {"suffix": ".tflite", "available": tf_ok},
        "onnx": {"suffix": ".onnx", "available": tf_ok and importlib.util.find_spec("tf2onnx") is not None,
                 "experimental": True},
    }


def build_inference_fn(model, *, nms: bool = False, conf: float = 0.25, iou: float = 0.7, max_det: int = 300):
    """Task-complete inference graph builder (reference: per-head
    Detect.export paths + NMSModel wrapper, exporter.py:1525). Shared by the
    Exporter and AutoBackend so the exported artifact and the reimported
    backend produce the SAME outputs. Static output shapes:

    task      nms=False                            nms=True
    --------  -----------------------------------  ------------------------------
    classify  probs (B, nc)                        same
    detect    preds (B, A, 4+nc)                   det (B,max_det,6), n_valid (B,)
    world     preds (B, A, 4+nc) (classes baked)   det (B,max_det,6), n_valid (B,)
    v10/e2e   det (B, max_det, 6), n_valid         same (NMS-free head)
    segment   preds+coeffs (B,A,4+nc+nm), proto    det, n_valid, masks (B,max_det,H/4,W/4)
    pose      preds+kpts (B, A, 4+nc+nk*nd)        det+kpts (B,max_det,6+nk*nd), n_valid
    obb       rboxes (B, A, 4+nc+1)                det (B,max_det,7 cxcywh,angle,conf,cls), n_valid
    """
    strides = tuple(float(s) for s in model.stride)
    embed_nms = bool(nms)
    task = model.task
    nc = model.nc

    def fwd(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        out = model.apply(variables, x, train=False)
        if task == "classify":
            return jax.nn.softmax(out if not isinstance(out, tuple) else out[0], axis=-1)

        if getattr(model, "end2end", False):  # v10: NMS-free top-k head
            from spectrogram_yolov11_tpu.ops.decode import decode_e2e, nms_free_postprocess

            preds = decode_e2e(out["one2one"], nc=nc, strides=strides)
            det = nms_free_postprocess(preds, max_det, nc)
            nv = (det[..., 4] > conf).sum(-1).astype(jnp.int32)
            return det, nv

        if task == "segment":
            from spectrogram_yolov11_tpu.ops.nms import non_max_suppression_extras

            feats, mc, proto = out
            preds = decode_detections(feats, nc=nc, strides=strides)
            preds = jnp.concatenate([preds, mc], axis=-1)
            if not embed_nms:
                return preds, proto
            det, nv = non_max_suppression_extras(preds, conf_thres=conf, iou_thres=iou, nc=nc, max_det=max_det)
            from spectrogram_yolov11_tpu.ops.masks import crop_masks_device

            masks = jax.nn.sigmoid(jnp.einsum("bdk,bhwk->bdhw", det[..., 6:], proto))
            # crop to box (reference process_mask, ops.py:679)
            masks = crop_masks_device(masks, det[..., :4], (x.shape[1], x.shape[2]))
            return det[..., :6], nv, masks

        if task == "pose":
            from spectrogram_yolov11_tpu.ops.decode import decode_kpts
            from spectrogram_yolov11_tpu.ops.nms import non_max_suppression_extras

            feats, kpt_raw = out
            nk, nd = getattr(model, "kpt_shape", (17, 3))
            shapes = feat_shapes(feats)
            kpts = decode_kpts(kpt_raw, (nk, nd), shapes, strides)
            preds = decode_detections(feats, nc=nc, strides=strides)
            preds = jnp.concatenate([preds, kpts.reshape(kpts.shape[0], kpts.shape[1], -1)], axis=-1)
            if not embed_nms:
                return preds
            return non_max_suppression_extras(preds, conf_thres=conf, iou_thres=iou, nc=nc, max_det=max_det)

        if task == "obb":
            from spectrogram_yolov11_tpu.ops.decode import decode_obb
            from spectrogram_yolov11_tpu.ops.nms import nms_rotated

            feats, angle_raw = out
            preds = decode_obb(feats, angle_raw, nc=nc, strides=strides)
            if not embed_nms:
                return preds
            return nms_rotated(preds, conf_thres=conf, iou_thres=iou, nc=nc, max_det=max_det)

        feats = out[0] if isinstance(out, tuple) else out
        preds = decode_detections(feats, nc=nc, strides=strides)
        if embed_nms:
            return non_max_suppression(preds, conf_thres=conf, iou_thres=iou, nc=nc, max_det=max_det)
        return preds

    return fwd


class Exporter:
    def __init__(self, model, variables, overrides: Optional[dict] = None):
        self.model = model
        self.variables = variables
        self.args = get_cfg(DEFAULT_CFG, {k: v for k, v in (overrides or {}).items() if k not in {"task", "model"}})
        self.imgsz = int(self.args.imgsz if isinstance(self.args.imgsz, int) else self.args.imgsz[0])

    def _forward_fn(self):
        return build_inference_fn(
            self.model, nms=bool(self.args.nms), conf=float(self.args.conf or 0.25),
            iou=float(self.args.iou), max_det=int(self.args.max_det),
        )

    def __call__(self) -> str:
        fmt = str(self.args.format or "stablehlo").lower()
        formats = export_formats()
        if fmt not in formats:
            raise ValueError(f"unknown export format '{fmt}'; choose from {list(formats)}")
        if not formats[fmt]["available"]:
            raise ModuleNotFoundError(
                f"format '{fmt}' needs optional deps not present in this environment "
                f"(availability matrix: { {k: v['available'] for k, v in formats.items()} })"
            )
        if fmt != "ckpt":
            # compiled-graph formats ship the deploy (RepConv-fused) form —
            # reference fuses before every export (engine/exporter.py:320);
            # ckpt keeps train-form params so training can resume from it
            from spectrogram_yolov11_tpu.nn.tasks import fuse_model

            self.model, self.variables = fuse_model(self.model, self.variables)
        if self.args.half:
            self.model.set_dtype(jnp.bfloat16)  # bf16 compute in the exported graph
        save_dir = get_save_dir(self.args, name="export")
        save_dir.mkdir(parents=True, exist_ok=True)
        stem = Path(str(self.args.model or "model")).stem or "model"
        out = getattr(self, f"_export_{fmt}")(save_dir / stem)
        if fmt in {"saved_model", "tflite", "onnx"}:
            self._write_metadata(Path(out))
        LOGGER.info(f"Export complete: {out}")
        return str(out)

    def _write_metadata(self, artifact: Path) -> None:
        """Metadata sidecar for opaque TF-chain artifacts (the reference embeds
        the same dict in every export, reference engine/exporter.py:1525
        metadata yaml): task/nc/names/stride so AutoBackend and downstream
        validators recover the task layout without the original model."""
        from spectrogram_yolov11_tpu.utils import yaml_save

        md = {
            "task": self.model.task,
            "nc": int(self.model.nc),
            "names": {int(k): str(v) for k, v in getattr(self.model, "names", {}).items()},
            "stride": [float(s) for s in self.model.stride],
            "imgsz": self.imgsz,
            "nms": bool(self.args.nms),
        }
        if getattr(self.model, "kpt_shape", None):
            md["kpt_shape"] = [int(x) for x in self.model.kpt_shape]
        dest = artifact / "metadata.yaml" if artifact.is_dir() else artifact.with_suffix(".metadata.yaml")
        yaml_save(dest, md)

    def _export_ckpt(self, base: Path) -> Path:
        from spectrogram_yolov11_tpu.engine.checkpoint import save_checkpoint

        p = base.with_suffix(".ckpt")
        save_checkpoint(
            p, variables=self.variables, ema_variables=None, opt_state=None, epoch=-1,
            best_fitness=0.0, updates=0,
            model_yaml={k: v for k, v in self.model.yaml.items() if k != "yaml_file"},
            names=self.model.names, nc=self.model.nc,
        )
        return p

    def _export_stablehlo(self, base: Path) -> Path:
        """AOT-lower the full inference pipeline to StableHLO MLIR text plus
        TWO sidecars: a .ckpt (this framework's AutoBackend reimport) and a
        native weights pack (<stem>.weights.bin + <stem>.weights.json
        manifest) holding the flattened f32/i32 leaves in the exact argument
        order of the lowered MLIR @main, so a C++ PjRt runtime can compile
        and feed it with no Python or msgpack (examples/cpp-stablehlo-
        inference/main.cpp consumes exactly this triple)."""
        import json

        import numpy as np

        fwd = self._forward_fn()
        batch = 1 if self.args.batch in (None, -1, 16) else int(self.args.batch)
        dummy = jnp.zeros((batch, self.imgsz, self.imgsz, 3), jnp.uint8)
        lowered = jax.jit(fwd).lower(self.variables, dummy)
        mlir_text = lowered.as_text()
        p = base.with_suffix(".stablehlo")
        p.write_text(mlir_text)
        self._export_ckpt(base)

        # native weights pack: leaves in jax pytree-flatten order == the
        # lowered function's leading argument order; the image is the final arg
        leaves, _ = jax.tree_util.tree_flatten(self.variables)
        paths = [
            "/".join(str(getattr(k, "key", k)) for k in kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(self.variables)[0]
        ]
        manifest, blobs, off = [], [], 0
        for name, leaf in zip(paths, leaves):
            a = np.ascontiguousarray(np.asarray(leaf))
            manifest.append({"name": name, "dtype": a.dtype.name, "shape": list(a.shape),
                             "offset": off, "nbytes": int(a.nbytes)})
            blobs.append(a.tobytes())
            off += a.nbytes
        base.with_suffix(".weights.bin").write_bytes(b"".join(blobs))
        base.with_suffix(".weights.json").write_text(json.dumps({
            "args": manifest,
            "image_input": {"dtype": "uint8", "shape": [batch, self.imgsz, self.imgsz, 3]},
            "nms": bool(self.args.nms),
            "task": self.model.task,
            "names": {int(k): v for k, v in getattr(self.model, "names", {}).items()},
        }))
        return p

    def _export_saved_model(self, base: Path) -> Path:
        import tensorflow as tf
        from jax.experimental import jax2tf

        fwd = self._forward_fn()
        variables = self.variables
        f = jax2tf.convert(lambda x: fwd(variables, x), polymorphic_shapes=None)
        module = tf.Module()
        module.f = tf.function(
            f, input_signature=[tf.TensorSpec([1, self.imgsz, self.imgsz, 3], tf.uint8)]
        )
        out = Path(str(base) + "_saved_model")
        tf.saved_model.save(module, str(out))
        return out

    def _export_tflite(self, base: Path) -> Path:
        import tensorflow as tf

        sm = self._export_saved_model(base)
        converter = tf.lite.TFLiteConverter.from_saved_model(str(sm))
        if self.args.int8:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            rep = self._representative_dataset()
            if rep is not None:  # full-integer PTQ with a real calibration set
                converter.representative_dataset = rep
        blob = converter.convert()
        p = base.with_suffix(".tflite")
        p.write_bytes(blob)
        return p

    def _export_onnx(self, base: Path) -> Path:
        import tf2onnx  # noqa: F401
        import tensorflow as tf
        from jax.experimental import jax2tf

        fwd = self._forward_fn()
        variables = self.variables
        f = tf.function(
            jax2tf.convert(lambda x: fwd(variables, x)),
            input_signature=[tf.TensorSpec([1, self.imgsz, self.imgsz, 3], tf.uint8)],
        )
        import tf2onnx.convert

        p = base.with_suffix(".onnx")
        tf2onnx.convert.from_function(f, input_signature=f.input_signature, output_path=str(p),
                                      opset=int(self.args.opset or 17))
        return p

    def _representative_dataset(self, n: int = 64):
        """INT8 calibration generator over the configured dataset's val images
        (reference: exporter.py:817-963 INT8 calibrator dataloader). Returns
        None when no dataset is resolvable — the converter then falls back to
        dynamic-range quantization."""
        try:
            import cv2
            import numpy as np

            from spectrogram_yolov11_tpu.data.dataset import check_det_dataset
            from spectrogram_yolov11_tpu.data.augment import letterbox

            data = check_det_dataset(str(self.args.data or "spectrogram_synth.yaml"))
            imgs = sorted(Path(data.get("val") or data["train"]).rglob("*.jpg"))[:n]
            if not imgs:
                return None
        except Exception as e:
            LOGGER.warning(f"int8 calibration dataset unavailable ({e}); using dynamic-range quantization")
            return None
        imgsz = self.imgsz

        def gen():
            for p in imgs:
                im = cv2.imread(str(p))
                if im is None:
                    continue
                lb, _, _ = letterbox(im, (imgsz, imgsz))
                yield [lb[None].astype("uint8")]

        return gen
