"""AutoBackend: one forward() over every weight/artifact format.

Counterpart of the reference AutoBackend (nn/autobackend.py:54), which
multiplexes 13 runtimes behind one interface. Our format set (availability-
gated the same way):

  .yaml       architecture, fresh init (random weights)
  .ckpt       our msgpack checkpoints (native path, jitted)
  .pt         imported reference torch checkpoints (via utils/torch_compat)
  .stablehlo  AOT StableHLO MLIR + sidecar .ckpt (compiled via jax)
  _saved_model / .tflite / .onnx   (need tensorflow / onnxruntime)

forward(imgs_u8 NHWC) -> decoded predictions (B, A, 4+nc) or task tuple.
"""

from __future__ import annotations

from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np


def _order_outs(outs):
    """Normalize a TF-chain/ONNX artifact's output list: single output ->
    array; multi-output task graphs (segment: preds + proto) -> tuple with
    the rank-3 decoded-preds tensor first (the exporter's nms=False layout),
    since TF/TFLite converters do not guarantee signature output order."""
    if len(outs) == 1:
        return jnp.asarray(outs[0])
    ordered = sorted(outs, key=lambda r: np.asarray(r).ndim != 3)
    return tuple(jnp.asarray(o) for o in ordered)


def _load_metadata(path: str | Path) -> dict:
    """Read the exporter's metadata sidecar (metadata.yaml inside a
    saved_model dir, <stem>.metadata.yaml next to a .tflite/.onnx file) —
    reference AutoBackend reads the same embedded dict (autobackend.py:54)."""
    p = Path(path)
    cand = p / "metadata.yaml" if p.is_dir() else p.with_suffix(".metadata.yaml")
    if cand.exists():
        from spectrogram_yolov11_tpu.utils import yaml_load

        return yaml_load(cand)
    return {}


def _model_type(path: str) -> str:
    """Sniff the artifact kind from the path (reference: autobackend.py:777)."""
    s = str(path)
    if s.startswith(("http://", "https://", "grpc://")):
        return "remote"  # KServe-v2 server URL (reference: triton branch, autobackend.py:520)
    for kind in ("ckpt", "pt", "stablehlo", "tflite", "onnx"):
        if s.endswith("." + kind):
            return kind
    if s.endswith((".yaml", ".yml")):
        return "yaml"
    if s.endswith("_saved_model") or (Path(s).is_dir() and (Path(s) / "saved_model.pb").exists()):
        return "saved_model"
    return "yaml"


class AutoBackend:
    def __init__(self, weights: str | Path = "yolo11n.yaml", half: bool = False, verbose: bool = False):
        self.kind = _model_type(weights)
        self.weights = str(weights)
        self.model = None
        self.variables = None
        self.names = {}
        self.stride = np.array([8.0, 16.0, 32.0])
        self._fn = None

        if self.kind in {"yaml", "ckpt", "pt", "stablehlo"}:
            from spectrogram_yolov11_tpu.engine.exporter import build_inference_fn
            from spectrogram_yolov11_tpu.engine.model import YOLO

            src = self.weights
            if self.kind == "stablehlo":
                # sidecar .ckpt next to the MLIR holds weights + metadata; the
                # MLIR itself is for external AOT runtimes (examples/cpp-*) —
                # in-process we jit the same graph natively
                ckpt = Path(self.weights).with_suffix(".ckpt")
                if not ckpt.exists():
                    raise FileNotFoundError(f"stablehlo sidecar checkpoint missing: {ckpt}")
                src = str(ckpt)
            y = YOLO(src)
            y._ensure_variables()
            from spectrogram_yolov11_tpu.nn.tasks import fuse_model

            # reference AutoBackend fuses on load (nn/autobackend.py:146)
            self.model, self.variables = fuse_model(y.model, y.variables)
            # checkpoint restore yields HOST numpy leaves; without an explicit
            # upload every call re-ships ~all params through the dispatch path
            # (measured: dominates serve-mode latency on the tunneled dev
            # harness). One device_put pins them in HBM.
            self.variables = jax.device_put(self.variables)
            if half:  # bf16 compute, the TPU serving fast path (params stay f32)
                self.model.set_dtype(jnp.bfloat16)
            self.names = y.names
            self.stride = y.stride
            self.task = y.task
            self.nc = y.model.nc
            # the SAME task-complete graph the Exporter serializes (nms=False
            # layout: decoded preds + per-task extras)
            fn = jax.jit(build_inference_fn(self.model, nms=False))
            self._fn = lambda x: fn(self.variables, x)
        elif self.kind == "saved_model":
            import tensorflow as tf

            self._tf = tf.saved_model.load(self.weights)

            def run_sm(x):
                out = self._tf.f(np.asarray(x))
                outs = list(out) if isinstance(out, (tuple, list)) else [out]
                return _order_outs([np.asarray(o) for o in outs])

            self._fn = run_sm
            self.task = "detect"
        elif self.kind == "tflite":
            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=self.weights)
            self._interp.allocate_tensors()

            def run(x):
                inp = self._interp.get_input_details()[0]
                self._interp.set_tensor(inp["index"], np.asarray(x))
                self._interp.invoke()
                outs = [self._interp.get_tensor(o["index"]) for o in self._interp.get_output_details()]
                return _order_outs(outs)

            self._fn = run
            self.task = "detect"
        elif self.kind == "remote":
            # KServe-v2 HTTP server (ours via `yolo serve`, or any compliant
            # server incl. Triton) — reference autobackend.py triton branch.
            from spectrogram_yolov11_tpu.serve import RemoteModel

            self._remote = RemoteModel(self.weights)
            md = self._remote.metadata or {}
            self.task = str(md.get("task") or "detect")
            self.names = {int(k): str(v) for k, v in (md.get("names") or {}).items()}
            if md.get("stride"):
                self.stride = np.asarray(md["stride"], np.float32)
            if md.get("kpt_shape"):
                self.kpt_shape = tuple(int(x) for x in md["kpt_shape"])

            # opt-in encoded wire format (serve.py BYTES ingest): ship
            # per-image JPEG/PNG instead of raw uint8 tensors — cuts the
            # client->server wire bytes ~10-30x (SYT_WIRE_ENCODE=jpg|png[:q])
            import os

            wire = os.environ.get("SYT_WIRE_ENCODE", "")

            def run(x):
                if wire:
                    from spectrogram_yolov11_tpu.serve import encode_images

                    fmt, _, q = wire.partition(":")
                    outs = self._remote(encode_images(
                        np.asarray(x), fmt=f".{fmt.lstrip('.')}", quality=int(q or 90)))
                else:
                    outs = self._remote(np.asarray(x))
                return outs[0] if len(outs) == 1 else tuple(outs)

            self._fn = run
        elif self.kind == "onnx":
            import onnxruntime as ort

            self._sess = ort.InferenceSession(self.weights)
            name = self._sess.get_inputs()[0].name
            self._fn = lambda x: _order_outs(self._sess.run(None, {name: np.asarray(x)}))
            self.task = "detect"
        else:
            raise ValueError(f"unsupported weights: {weights}")

        if self.kind in {"saved_model", "tflite", "onnx"}:
            md = _load_metadata(self.weights)
            if md:
                self.task = str(md.get("task", self.task))
                if md.get("names"):
                    self.names = {int(k): str(v) for k, v in md["names"].items()}
                if md.get("stride"):
                    self.stride = np.asarray(md["stride"], np.float32)
                if md.get("nc") is not None:
                    self.nc = int(md["nc"])
                if md.get("kpt_shape"):
                    self.kpt_shape = tuple(int(x) for x in md["kpt_shape"])

    def forward(self, imgs_u8):
        return self._fn(imgs_u8)

    __call__ = forward

    def warmup(self, imgsz=(1, 640, 640, 3)):
        """Compile/alloc with a dummy batch (reference: autobackend.py:761)."""
        self.forward(jnp.zeros(imgsz, jnp.uint8))
        return self
