"""Benchmark harness: export -> predict -> val across formats.

Counterpart of the reference benchmark() (utils/benchmarks.py:51): for each
available export format, run inference + validation and report a table with
metric floors asserted. Also ProfileModels-style latency profiling for our
formats (reference: benchmarks.py:336)."""

from __future__ import annotations

import time
from pathlib import Path
from typing import List, Optional

import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


def _val_through_artifact(path: str, fmt: str, data: str, imgsz: int) -> dict:
    """Score the EXPORTED artifact on the val protocol.

    ckpt/stablehlo reload the serialized weights+metadata through the YOLO
    facade (exercising save->load); opaque-graph formats (saved_model/tflite/
    onnx) run through BackendValidator, which consumes the artifact's own
    decoded outputs."""
    from spectrogram_yolov11_tpu.engine.model import YOLO

    if fmt == "ckpt":
        return YOLO(path).val(data=data, imgsz=imgsz, batch=8)
    if fmt == "stablehlo":
        return YOLO(str(Path(path).with_suffix(".ckpt"))).val(data=data, imgsz=imgsz, batch=8)
    from spectrogram_yolov11_tpu.engine.validator import BackendValidator
    from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

    v = BackendValidator(AutoBackend(path), overrides={"data": data, "imgsz": imgsz, "batch": 8})
    return v(data)


def benchmark(model=None, data: Optional[str] = None, imgsz: int = 640, half: bool = False,
              verbose: bool = True, floor: float = 0.0) -> List[dict]:
    """Run each available format through predict+val (reference: benchmarks.py:51)."""
    from spectrogram_yolov11_tpu.engine.exporter import export_formats
    from spectrogram_yolov11_tpu.engine.model import YOLO

    if model is None:
        model = YOLO("yolo11n.yaml")
    rows = []
    for fmt, meta in export_formats().items():
        t0 = time.perf_counter()
        status, metric, speed = "x", None, None
        try:
            if not meta["available"]:
                raise ModuleNotFoundError("deps unavailable")
            if fmt == "ckpt":
                path = model.export(format="ckpt", imgsz=imgsz)
            elif fmt == "stablehlo":
                path = model.export(format="stablehlo", imgsz=imgsz)
            else:
                path = model.export(format=fmt, imgsz=imgsz)
            # inference smoke on random frame
            from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

            backend = AutoBackend(path)
            backend.warmup((1, imgsz, imgsz, 3))
            t1 = time.perf_counter()
            backend.forward(np.zeros((1, imgsz, imgsz, 3), np.uint8))
            speed = (time.perf_counter() - t1) * 1e3
            if data is not None:
                # val THROUGH the exported artifact, never the in-memory model
                # (reference benchmarks.py:51) — a broken export must fail here
                res = _val_through_artifact(path, fmt, data=data, imgsz=imgsz)
                metric = res.get("metrics/mAP50-95(B)")
                assert metric is None or metric >= floor, f"mAP {metric} < floor {floor}"
            status = "ok"
        except Exception as e:  # pragma: no cover - env dependent
            LOGGER.warning(f"benchmark: {fmt} failed: {e}")
            status = f"fail: {str(e)[:60]}"
        rows.append({"format": fmt, "status": status, "metric": metric, "ms": speed,
                     "total_s": round(time.perf_counter() - t0, 1)})
    if verbose:
        LOGGER.info(f"{'format':<14}{'status':<28}{'mAP50-95':<10}{'ms/img':<8}")
        for r in rows:
            LOGGER.info(f"{r['format']:<14}{r['status']:<28}{str(r['metric']):<10}{str(r['ms']):<8}")
    return rows


class RF100Benchmark:
    """Multi-dataset mAP sweep (reference: benchmarks.py:201 RF100Benchmark).

    The reference's class downloads the Roboflow-100 suite and scrapes its own
    console log for per-dataset mAP. Zero-egress redesign: datasets are LOCAL
    yamls listed one-per-line in a text file (`parse_dataset`), and `evaluate`
    runs the real validator and records the metric directly — no log scraping.
    `set_key` is kept for API compatibility (gated on the roboflow SDK, absent
    in this image)."""

    def __init__(self):
        self.ds_names: List[str] = []
        self.ds_cfg_list: List[Path] = []
        self.rf = None
        self.val_metrics = ["class", "images", "targets", "precision", "recall", "map50", "map95"]

    def set_key(self, api_key: str):  # pragma: no cover - needs roboflow SDK
        from roboflow import Roboflow  # gated optional dep (reference set_key)

        self.rf = Roboflow(api_key=api_key)

    def parse_dataset(self, ds_link_txt: str = "datasets_links.txt"):
        """Read dataset yaml paths (one per line; '#' comments allowed)."""
        self.ds_names, self.ds_cfg_list = [], []
        for line in Path(ds_link_txt).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            p = Path(line)
            self.ds_names.append(p.stem)
            self.ds_cfg_list.append(p)
        return self.ds_names, self.ds_cfg_list

    @staticmethod
    def fix_yaml(path):
        """Normalize a data yaml's split paths (reference fix_yaml)."""
        from spectrogram_yolov11_tpu.utils import yaml_load, yaml_save

        d = yaml_load(path)
        d["train"] = "train/images"
        d["val"] = "valid/images"
        yaml_save(path, d)

    def evaluate(self, yaml_path, val_log_file, eval_log_file, list_ind: int, model=None,
                 imgsz: int = 640) -> float:
        """Val `model` on one dataset; append 'name: mAP50' to the eval log."""
        from spectrogram_yolov11_tpu.engine.model import YOLO

        model = model or YOLO("yolo11n.yaml")
        res = model.val(data=str(yaml_path), imgsz=imgsz, verbose=False, plots=False)
        map50 = float(res.get("metrics/mAP50(B)", 0.0))
        with open(val_log_file, "a") as f:
            f.write(f"{self.ds_names[list_ind]}: {res}\n")
        with open(eval_log_file, "a") as f:
            f.write(f"{self.ds_names[list_ind]}: {map50}\n")
        return map50


class ProfileModels:
    """Latency profiler over artifacts (reference: benchmarks.py:336)."""

    def __init__(self, paths: List[str], imgsz: int = 640, num_warmup: int = 5, num_timed: int = 30):
        self.paths = paths
        self.imgsz = imgsz
        self.num_warmup = num_warmup
        self.num_timed = num_timed

    def run(self) -> List[dict]:
        import jax

        from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

        out = []
        for p in self.paths:
            backend = AutoBackend(p)
            x = np.zeros((1, self.imgsz, self.imgsz, 3), np.uint8)
            for _ in range(self.num_warmup):
                r = backend.forward(x)
            jax.block_until_ready(r)
            times = []
            for _ in range(self.num_timed):
                t0 = time.perf_counter()
                r = backend.forward(x)
                jax.block_until_ready(r)
                times.append((time.perf_counter() - t0) * 1e3)
            arr = np.asarray(times)
            row = {"model": str(p), "mean_ms": float(arr.mean()), "std_ms": float(arr.std()),
                   "p50_ms": float(np.median(arr))}
            LOGGER.info(f"{Path(p).name}: {row['mean_ms']:.2f} +/- {row['std_ms']:.2f} ms")
            out.append(row)
        return out
