"""The `YOLO` facade — the public API of the framework.

Counterpart of the reference Model facade
(/root/reference/ultralytics/engine/model.py:29): one object that loads a
model (.yaml architecture, our .ckpt checkpoints, or imported reference .pt)
and dispatches train/val/predict/track/export/benchmark through the per-task
plug-in map (reference task_map, models/yolo/model.py:26).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax

from spectrogram_yolov11_tpu.nn.tasks import build_model, guess_model_task, yaml_model_load
from spectrogram_yolov11_tpu.utils import LOGGER
from spectrogram_yolov11_tpu.utils.callbacks import default_callbacks


def _intersect_variables(dst, src):
    """Transfer every leaf from ``src`` whose path+shape matches ``dst``
    (reference utils/torch_utils.py:454 ``intersect_dicts`` — the
    `YOLO(yaml).load(weights)` transfer-learning semantics). Returns the
    merged tree and the number of transferred leaves."""
    if not isinstance(dst, dict) or not isinstance(src, dict):
        same = getattr(dst, "shape", None) == getattr(src, "shape", ()) and hasattr(src, "shape")
        return (src, 1) if same else (dst, 0)
    out, n = {}, 0
    for k, v in dst.items():
        if k in src:
            out[k], m = _intersect_variables(v, src[k])
            n += m
        else:
            out[k] = v
    return out, n


class YOLO:
    """`YOLO('yolo11n.yaml')` / `YOLO('best.ckpt')` / `YOLO('yolo11n.pt')`."""

    def __init__(self, model: Union[str, Path, list, tuple] = "yolo11n.yaml", task: Optional[str] = None,
                 verbose: bool = False):
        self._ensemble = None
        self.callbacks = default_callbacks()
        self.backend = None  # set for remote (served) models only
        if isinstance(model, (list, tuple)):  # weights ensemble (reference nn/tasks.py:718 Ensemble)
            members = [YOLO(m, task=task) for m in model]
            assert all(m.task == "detect" for m in members), "weight ensembling supports the detect task"
            self._ensemble = members
            lead = members[0]
            self.model_path = str(model[0])
            self.task = lead.task
            self.ckpt_meta = lead.ckpt_meta
            self.model = lead.model
            self.variables = lead.variables
            self.overrides = dict(lead.overrides)
            return
        self.model_path = str(model)
        self.task = task
        self.ckpt_meta: Dict[str, Any] = {}
        self.variables = None
        self.model = None
        self.overrides: Dict[str, Any] = {}
        if self.model_path.startswith(("http://", "https://", "grpc://")):
            self._load_remote(self.model_path)
            return
        suffix = Path(self.model_path).suffix
        if suffix in {".yaml", ".yml"}:
            self._new(self.model_path, verbose=verbose)
        elif suffix == ".ckpt":
            self._load_ckpt(self.model_path)
        elif suffix == ".pt":
            self._import_pt(self.model_path)
        elif suffix in {".stablehlo", ".tflite", ".onnx"} or (
            Path(self.model_path).is_dir() and (Path(self.model_path) / "saved_model.pb").exists()
        ):
            # exported artifact -> AutoBackend, same predict/val machinery as
            # served models (reference: YOLO('model.onnx') routes AutoBackend)
            self._load_backend(self.model_path)
        else:
            # bare name like 'yolo11n' -> yaml
            self._new(self.model_path + ".yaml", verbose=verbose)

    # -- constructors -----------------------------------------------------
    def _new(self, cfg_path: str, verbose: bool = False):
        d = yaml_model_load(cfg_path)
        self.task = self.task or guess_model_task(d)
        self.model = build_model(d, verbose=verbose, task=self.task)
        self.overrides["model"] = cfg_path
        self.overrides["task"] = self.task

    def _load_ckpt(self, path: str):
        from spectrogram_yolov11_tpu.engine.checkpoint import load_checkpoint

        tree, meta = load_checkpoint(path)
        d = meta["model_yaml"]
        self.task = self.task or guess_model_task(d)
        self.model = build_model(d, nc=meta.get("nc"), verbose=False, task=self.task)
        if meta.get("names"):
            self.model.names = meta["names"]
        variables = tree.get("ema") or tree["variables"]
        self.variables = jax.device_put(variables)
        self.ckpt_meta = meta
        self.overrides["model"] = path
        ta = meta.get("train_args") or {}
        if ta.get("data"):
            self.ckpt_data = ta["data"]

    def _import_pt(self, path: str):
        """Ingest a reference .pt checkpoint (requires torch)."""
        from spectrogram_yolov11_tpu.utils.torch_compat import import_pt, load_state_into_variables, torch_state_to_variables

        state, meta = import_pt(path)
        d = meta.get("yaml")
        if d is None:
            raise ValueError(f"{path} has no model yaml metadata; cannot rebuild architecture")
        d = dict(d)
        self.task = self.task or guess_model_task(d)
        self.model = build_model(d, nc=meta.get("nc"), verbose=False, task=self.task)
        if meta.get("names"):
            self.model.names = dict(meta["names"])
        v = self.model.init(jax.random.PRNGKey(0))
        head_layer = f"model_{self.model.head_spec.i}"
        conv = torch_state_to_variables(state, head_layer=head_layer, head_task=self.task)
        self.variables = jax.device_put(load_state_into_variables(v, conv, strict=False))
        self.overrides["model"] = path

    def _load_remote(self, url: str):
        """Attach to a served model: `YOLO('http://host:8000/name')` predicts
        and vals through the KServe-v2 protocol (reference engine/model.py:149
        Triton-URL branch + utils/triton.py). Inference-only by nature."""
        from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

        self.backend = AutoBackend(url)
        self.task = self.task or self.backend.task
        self.overrides["task"] = self.task

    def _load_backend(self, path: str):
        """Attach an exported artifact (.stablehlo / .tflite / .onnx /
        saved_model dir) through AutoBackend — predict and val run through the
        same backend machinery as served models, so `YOLO('best.stablehlo')`
        behaves like the reference's `YOLO('best.onnx')`."""
        from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

        self.backend = AutoBackend(path)
        self.task = self.task or getattr(self.backend, "task", None) or "detect"
        self.overrides["task"] = self.task

    def _ensure_variables(self):
        if self.variables is None and self.backend is None:
            self.variables = self.model.init(jax.random.PRNGKey(0))

    # -- callback bus on the facade (reference engine/model.py:949-996) ----
    def add_callback(self, event: str, func) -> None:
        """Attach `func` to `event`; it is forwarded into every trainer /
        validator / predictor this model creates (reference add_callback)."""
        self.callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str) -> None:
        self.callbacks[event] = []

    def reset_callbacks(self) -> None:
        self.callbacks = default_callbacks()

    def _merge_callbacks(self, runner) -> None:
        cbs = getattr(runner, "callbacks", None)
        if cbs is None:
            cbs = runner.callbacks = {}
        for e, fns in self.callbacks.items():
            for f in fns:
                if f not in cbs.setdefault(e, []):
                    cbs[e].append(f)

    def load(self, weights: Union[str, Path] = "yolo11n.pt") -> "YOLO":
        """Transfer matching weights into the current architecture —
        `YOLO('yolo11n.yaml').load('yolo11n.pt')` (reference engine/model.py:304).
        Leaves whose path+shape match are copied; the rest keep their init."""
        self._ensure_variables()
        path = str(weights)
        suffix = Path(path).suffix
        if suffix == ".pt":
            from spectrogram_yolov11_tpu.utils.torch_compat import (import_pt, load_state_into_variables,
                                                                    torch_state_to_variables)

            state, _meta = import_pt(path)
            head_layer = f"model_{self.model.head_spec.i}"
            conv = torch_state_to_variables(state, head_layer=head_layer, head_task=self.task)
            self.variables = jax.device_put(load_state_into_variables(self.variables, conv, strict=False))
        else:  # our .ckpt
            from spectrogram_yolov11_tpu.engine.checkpoint import load_checkpoint

            tree, _meta = load_checkpoint(path)
            src = tree.get("ema") or tree["variables"]
            merged, n = _intersect_variables(self.variables, src)
            LOGGER.info(f"load({path}): transferred {n} matching weight leaves")
            self.variables = jax.device_put(merged)
        self._predictor_key = None
        return self

    def reset_weights(self) -> "YOLO":
        """Re-initialize every parameter (reference engine/model.py:288)."""
        self._ensure_variables()
        self.variables = jax.device_put(self.model.init(jax.random.PRNGKey(0)))
        self._predictor_key = None
        return self

    def eval(self) -> "YOLO":
        """Drop-in compat: our forwards are pure functions (train=False is an
        argument, not module state), so there is no mode bit to flip."""
        return self

    @property
    def device(self) -> str:
        if self.variables is not None:
            leaves = jax.tree_util.tree_leaves(self.variables)
            if leaves and hasattr(leaves[0], "devices"):
                return str(next(iter(leaves[0].devices())))
        return str(jax.devices()[0])

    @property
    def transforms(self):
        """Reference parity: custom inference transforms (None unless a
        checkpoint carries them — ours never do; preprocess is explicit)."""
        return None

    @property
    def names(self) -> Dict[int, str]:
        if self.model is None and self.backend is not None:
            return self.backend.names
        return self.model.names

    @property
    def stride(self):
        if self.model is None and self.backend is not None:
            return self.backend.stride
        return self.model.stride

    # -- modes ------------------------------------------------------------
    def train(self, **kwargs) -> Dict[str, float]:
        from spectrogram_yolov11_tpu.engine.trainer import TASK2TRAINER

        if self._ensemble is not None:
            raise ValueError("weight ensembles are inference-only; train the members individually")
        if self.backend is not None:
            raise ValueError("remote (served) models are inference-only; train locally and re-serve")
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        overrides.setdefault("model", self.model_path)
        if self.task == "classify":
            from spectrogram_yolov11_tpu.engine.classify import ClassificationTrainer

            trainer_cls = ClassificationTrainer
        elif self.task == "rtdetr":
            from spectrogram_yolov11_tpu.models.rtdetr import RTDETRTrainer

            trainer_cls = RTDETRTrainer
        else:
            trainer_cls = TASK2TRAINER[self.task]
        self._ensure_variables()
        trainer = trainer_cls(overrides=overrides, model=self.model, variables=self.variables)
        self._merge_callbacks(trainer)
        metrics = trainer.train()
        self.model = trainer.model  # trainer may rebuild (nc/kpt_shape from data)
        self.variables = trainer.variables
        self.trainer = trainer
        self._predictor_key = None  # weights changed: next predict() rebuilds
        return metrics

    def val(self, **kwargs) -> Dict[str, float]:
        from spectrogram_yolov11_tpu.engine import validator as V

        self._ensure_variables()
        overrides = {k: v for k, v in {**self.overrides, **kwargs}.items() if k not in {"model", "task", "mode"}}
        data = overrides.pop("data", None) or getattr(self, "ckpt_data", None)
        if self.backend is not None:
            # served model: score THROUGH the remote graph (same path as
            # benchmark()'s artifact-true validation)
            validator = V.BackendValidator(self.backend, overrides=overrides)
            validator.callbacks = self.callbacks  # shared, like the reference
            self.validator = validator
            return validator(data=data)
        if self.task == "rtdetr":
            from spectrogram_yolov11_tpu.models.rtdetr import RTDETRValidator as cls
        else:
            cls = {
                "detect": V.DetectionValidator,
                "world": V.DetectionValidator,  # world eval = detect decode+NMS over text classes
                "segment": V.SegmentationValidator,
                "pose": V.PoseValidator,
                "obb": V.OBBValidator,
                "classify": V.ClassificationValidator,
            }[self.task]
        validator = cls(self.model, self.variables, overrides=overrides)
        validator.callbacks = self.callbacks  # shared, like the reference
        self.validator = validator
        return validator(data=data)

    def predict(self, source=None, stream: bool = False, **kwargs) -> List:
        from spectrogram_yolov11_tpu.engine.predictor import (BasePredictor, ClassificationPredictor, OBBPredictor, PosePredictor, SegmentationPredictor)

        self._ensure_variables()
        overrides = {k: v for k, v in {**self.overrides, **kwargs}.items() if k not in {"model", "task", "mode"}}
        # Reuse the predictor (and its compiled device program) across calls
        # when the args that shaped it are unchanged — the reference does the
        # same (engine/model.py:549 "if not self.predictor"); for us a rebuild
        # means re-jitting, so this turns repeated predict() calls from
        # seconds into milliseconds. Any changed override rebuilds.
        key = tuple(sorted((k, repr(v)) for k, v in overrides.items()))
        if getattr(self, "predictor", None) is not None and getattr(self, "_predictor_key", None) == key:
            self.predictor.callbacks = self.callbacks
            return self.predictor(source, stream=stream, batch_size=kwargs.get("batch", 1))
        if self.backend is not None:
            from spectrogram_yolov11_tpu.serve import RemotePredictor

            self.predictor = RemotePredictor(self.backend, overrides=overrides)
            self.predictor.callbacks = self.callbacks
            self._predictor_key = key
            return self.predictor(source, stream=stream, batch_size=kwargs.get("batch", 1))
        cls = {"classify": ClassificationPredictor, "segment": SegmentationPredictor, "pose": PosePredictor, "obb": OBBPredictor}.get(self.task, BasePredictor)
        if self.task == "rtdetr":
            from spectrogram_yolov11_tpu.models.rtdetr import RTDETRPredictor as cls  # noqa: F811
        elif getattr(self, "_fastsam", False):
            from spectrogram_yolov11_tpu.models.fastsam import FastSAMPredictor as cls  # noqa: F811
        if self._ensemble is not None:
            from spectrogram_yolov11_tpu.engine.predictor import EnsemblePredictor

            for m in self._ensemble:
                m._ensure_variables()
            self.predictor = EnsemblePredictor([(m.model, m.variables) for m in self._ensemble],
                                               overrides=overrides)
        else:
            self.predictor = cls(self.model, self.variables, overrides=overrides)
        self.predictor.callbacks = self.callbacks  # shared, like the reference
        self._predictor_key = key
        return self.predictor(source, stream=stream, batch_size=kwargs.get("batch", 1))

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, source=None, persist: bool = False, tracker: str = "botsort.yaml",
              stream: bool = False, **kwargs):
        from spectrogram_yolov11_tpu.trackers.track import track_results, track_stream

        if stream:
            # per-frame streaming hookup (reference registers tracker callbacks
            # on the predictor, trackers/track.py:93) — frames are tracked as
            # they arrive, never materialized as a list
            gen = self.predict(source, stream=True, **kwargs)
            return track_stream(self, gen, persist=persist, tracker=tracker)
        results = self.predict(source, **kwargs)
        return track_results(self, results, persist=persist, tracker=tracker)

    def export(self, **kwargs):
        from spectrogram_yolov11_tpu.engine.exporter import Exporter

        if self.backend is not None:
            raise ValueError("remote (served) models cannot be exported; export from the local checkpoint")
        self._ensure_variables()
        return Exporter(self.model, self.variables, overrides={**self.overrides, **kwargs})()

    def benchmark(self, **kwargs):
        from spectrogram_yolov11_tpu.utils.benchmarks import benchmark

        return benchmark(model=self, **kwargs)

    def tune(self, iterations: int = 10, use_ray: bool = False, **kwargs):
        if use_ray:  # reference engine/model.py:817 tune(use_ray=True)
            from spectrogram_yolov11_tpu.engine.tuner import run_ray_tune

            self._ensure_variables()
            return run_ray_tune(self, max_samples=iterations, **kwargs)
        from spectrogram_yolov11_tpu.engine.tuner import Tuner

        overrides = {**self.overrides, **kwargs}
        return Tuner(overrides=overrides)(model=self, iterations=iterations)

    def save(self, path: Union[str, Path]):
        from spectrogram_yolov11_tpu.engine.checkpoint import save_checkpoint

        self._ensure_variables()
        save_checkpoint(
            Path(path),
            variables=self.variables,
            ema_variables=None,
            opt_state=None,
            epoch=-1,
            best_fitness=0.0,
            updates=0,
            model_yaml={k: v for k, v in self.model.yaml.items() if k != "yaml_file"},
            names=self.model.names,
            nc=self.model.nc,
        )

    def info(self, imgsz: int = 640, flops: bool = True):
        self._ensure_variables()
        return self.model.info(self.variables, imgsz=imgsz, flops=flops)

    def profile(self, imgsz: int = 256, **kwargs):
        """Per-layer params/FLOPs/ms table (reference predict(profile=True) /
        BaseModel._profile_one_layer, nn/tasks.py:198)."""
        self._ensure_variables()
        return self.model.profile(self.variables, imgsz=imgsz, **kwargs)

    def embed(self, source, embed: Optional[list] = None, imgsz: int = 640, **kwargs) -> List:
        """Feature embeddings per image (reference engine/model.py:456 embed +
        tests/test_python.py:566): mean-pooled activations of the requested
        layer indices (default: the layer feeding the head), L2-ready (B, C).
        """
        import cv2
        import jax.numpy as jnp
        import numpy as np

        from spectrogram_yolov11_tpu.data.augment import letterbox
        from spectrogram_yolov11_tpu.data.loaders import load_inference_source

        self._ensure_variables()
        idxs = tuple(embed) if embed else (len(self.model.specs) - 2,)
        imgsz = int(imgsz)
        fn = jax.jit(lambda v, x: self.model.graph.apply(v, x, train=False, embed=idxs))
        out = []
        for _path, img, _ in load_inference_source(source):
            lb, _, _ = letterbox(img, (imgsz, imgsz))
            x = jnp.asarray(lb[None, ..., ::-1].astype(np.float32) / 255.0)
            out.append(np.asarray(fn(self.variables, x))[0])
        return out

    def fuse(self):
        """RepConv branches fold into single convs automatically wherever an
        inference pair is built (predictor/exporter/AutoBackend —
        `nn.tasks.fuse_model`); plain conv+BN affines fuse at jit time. The
        facade keeps the train-form model so training/resume keep working, so
        this is a no-op here (reference fuse() mutates in place and forfeits
        further training, engine/model.py:396)."""
        LOGGER.info("fuse(): RepConv folding applies at predict/export; conv+BN folds at jit time.")
        return self

    def set_classes(self, classes) -> None:
        """World models: re-embed class names (reference: engine/model.py YOLOWorld)."""
        if not hasattr(self.model, "set_classes"):
            raise AttributeError(f"{self.task} models have a fixed class head; set_classes is world-only")
        self.model.set_classes(classes)
        self._predictor_key = None  # class embeddings changed: rebuild predictor


class YOLOWorld(YOLO):
    """`YOLOWorld('yolov8s-world.yaml')` facade (reference: models/yolo/model.py:62)."""

    def __init__(self, model="yolov8s-world.yaml", verbose: bool = False):
        super().__init__(model, task="world", verbose=verbose)
