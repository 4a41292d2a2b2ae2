"""Tuner: evolutionary hyperparameter search.

Counterpart of the reference Tuner (engine/tuner.py:33): mutate hyp -> short
train -> fitness logged to CSV -> repeat, mutating around the best row."""

from __future__ import annotations

import csv
from typing import Dict, Optional

import numpy as np

from spectrogram_yolov11_tpu.cfg import get_cfg, get_save_dir
from spectrogram_yolov11_tpu.utils import DEFAULT_CFG, LOGGER, yaml_save

# search space: (min, max) per hyperparameter (reference: tuner.py:62-86 gains)
SPACE = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (0.02, 10.0),
    "cls": (0.2, 4.0),
    "dfl": (0.4, 6.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
}


class Tuner:
    def __init__(self, args=DEFAULT_CFG, overrides: Optional[dict] = None):
        self.args = get_cfg(args, overrides or {})
        self.space = SPACE
        self.tune_dir = get_save_dir(self.args, name="tune")
        self.csv = self.tune_dir / "tune_results.csv"

    def _mutate(self, parent: Dict[str, float], mutation: float = 0.8, sigma: float = 0.2) -> Dict[str, float]:
        """Gaussian mutation around the parent (reference: tuner.py:_mutate)."""
        rng = np.random.default_rng()
        child = dict(parent)
        while True:
            changed = False
            for k, (lo, hi) in self.space.items():
                if rng.random() < mutation:
                    child[k] = float(np.clip(parent[k] * (1 + rng.normal(0, sigma)), lo, hi))
                    changed = changed or child[k] != parent[k]
            if changed:
                return child

    def _best_row(self):
        if not self.csv.exists():
            return None
        with open(self.csv) as f:
            rows = list(csv.DictReader(f))
        if not rows:
            return None
        return max(rows, key=lambda r: float(r["fitness"]))

    def __call__(self, model=None, iterations: int = 10, epochs_per_iter: int = 5, **train_kwargs):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        self.tune_dir.mkdir(parents=True, exist_ok=True)
        base = {k: getattr(self.args, k) for k in self.space}
        for it in range(iterations):
            best = self._best_row()
            parent = {k: float(best[k]) for k in self.space} if best else base
            hyp = self._mutate(parent) if best else dict(parent)
            LOGGER.info(f"Tuner iteration {it + 1}/{iterations}")
            m = YOLO(str(self.args.model or "yolo11n.yaml"))
            try:
                # forward the user's full (non-mutated) train config — the
                # reference passes train_args through (tuner.py __call__);
                # previously imgsz/batch/etc. silently reset to defaults
                skip = set(self.space) | {"model", "data", "epochs", "mode", "task",
                                          "save_dir", "project", "name", "resume"}
                call = {k: v for k, v in vars(self.args).items() if k not in skip and v is not None}
                call.update(hyp)
                call.update(train_kwargs)
                call.update(project=str(self.tune_dir), name=f"iter{it}", exist_ok=True,
                            plots=False, save=False, val=True)
                metrics = m.train(data=self.args.data, epochs=epochs_per_iter, **call)
                fitness = float(metrics.get("fitness", 0.0))
            except Exception as e:
                LOGGER.warning(f"Tuner iteration failed: {e}")
                fitness = 0.0
            write_header = not self.csv.exists()
            with open(self.csv, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=["iteration", "fitness", *self.space])
                if write_header:
                    w.writeheader()
                w.writerow({"iteration": it, "fitness": fitness, **hyp})
        best = self._best_row()
        if best:
            yaml_save(self.tune_dir / "best_hyperparameters.yaml", {k: float(best[k]) for k in self.space})
            LOGGER.info(f"Tuner: best fitness {best['fitness']} -> {self.tune_dir / 'best_hyperparameters.yaml'}")
            from spectrogram_yolov11_tpu.utils.plotting import plot_tune_results

            plot_tune_results(self.csv)  # tune_scatter_plots.png + tune_fitness.png
        return best


def run_ray_tune(model, space: dict | None = None, grace_period: int = 10,
                 max_samples: int = 10, **train_args):
    """Hyperparameter search via Ray Tune with an ASHA scheduler (reference:
    utils/tuner.py run_ray_tune). Availability-gated: raises a clear error
    when ray[tune] is not installed (this image ships without it)."""
    try:
        import ray
        from ray import tune
        from ray.air import RunConfig
        from ray.tune.schedulers import ASHAScheduler
    except ImportError as e:
        raise ModuleNotFoundError(
            'Ray Tune required: pip install "ray[tune]" (reference utils/tuner.py:30)'
        ) from e

    space = space or {
        "lr0": tune.uniform(1e-5, 1e-1),
        "lrf": tune.uniform(0.01, 1.0),
        "momentum": tune.uniform(0.6, 0.98),
        "weight_decay": tune.uniform(0.0, 0.001),
        "warmup_epochs": tune.uniform(0.0, 5.0),
        "box": tune.uniform(0.02, 0.2),
        "cls": tune.uniform(0.2, 4.0),
        "hsv_h": tune.uniform(0.0, 0.1),
        "hsv_s": tune.uniform(0.0, 0.9),
        "hsv_v": tune.uniform(0.0, 0.9),
        "degrees": tune.uniform(0.0, 45.0),
        "translate": tune.uniform(0.0, 0.9),
        "scale": tune.uniform(0.0, 0.9),
        "fliplr": tune.uniform(0.0, 1.0),
        "mosaic": tune.uniform(0.0, 1.0),
    }
    model_yaml = {k: v for k, v in model.model.yaml.items() if k != "yaml_file"}

    def _trainable(config):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        m = YOLO(model_yaml)
        res = m.train(**{**train_args, **config})
        from ray import train as ray_train

        ray_train.report({**res, "epoch": int(train_args.get("epochs", 10))})

    tuner = tune.Tuner(
        _trainable,
        param_space=space,
        tune_config=tune.TuneConfig(
            scheduler=ASHAScheduler(time_attr="epoch", metric="fitness", mode="max",
                                    max_t=int(train_args.get("epochs", 10)),
                                    grace_period=grace_period, reduction_factor=3),
            num_samples=max_samples,
        ),
        run_config=RunConfig(name="tune"),
    )
    results = tuner.fit()
    ray.shutdown()
    return results
