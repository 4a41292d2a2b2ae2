"""MLflow integration (reference: utils/callbacks/mlflow.py).

Availability-gated: importing raises ImportError without the mlflow package
(absent from this TPU image) and the callback bus skips it. Environment
variables mirror the reference: MLFLOW_TRACKING_URI, MLFLOW_EXPERIMENT_NAME,
MLFLOW_RUN.
"""

from __future__ import annotations

import os
from pathlib import Path

import mlflow

assert hasattr(mlflow, "__version__")

from spectrogram_yolov11_tpu.utils import LOGGER, RUNS_DIR


def _sanitize(d: dict) -> dict:
    return {k: float(v) for k, v in d.items() if _is_num(v)}


def _is_num(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def on_pretrain_routine_end(trainer) -> None:
    """Start a run and log the resolved config (reference mlflow.py:47)."""
    uri = os.environ.get("MLFLOW_TRACKING_URI") or str(RUNS_DIR / "mlflow")
    mlflow.set_tracking_uri(uri)
    exp = os.environ.get("MLFLOW_EXPERIMENT_NAME") or str(getattr(trainer.args, "project", None) or "runs")
    mlflow.set_experiment(exp)
    try:
        active = mlflow.active_run() or mlflow.start_run(
            run_name=os.environ.get("MLFLOW_RUN") or str(getattr(trainer.args, "name", None) or "train"))
        LOGGER.info(f"MLflow: run {active.info.run_id} at {uri}")
        mlflow.log_params({k: str(v) for k, v in vars(trainer.args).items()})
    except Exception as e:  # never let logging kill training
        LOGGER.warning(f"MLflow init failed: {e}")


def on_fit_epoch_end(trainer) -> None:
    if mlflow.active_run() is None:
        return
    step = int(getattr(trainer, "epoch", 0)) + 1
    mlflow.log_metrics(_sanitize(getattr(trainer, "label_loss", {}) or {}), step=step)
    mlflow.log_metrics(_sanitize(getattr(trainer, "metrics", {}) or {}), step=step)


def on_train_end(trainer) -> None:
    if mlflow.active_run() is None:
        return
    for art in ("best", "last"):
        p = getattr(trainer, art, None)
        if p is not None and Path(str(p)).exists():
            mlflow.log_artifact(str(p))
    mlflow.end_run()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
