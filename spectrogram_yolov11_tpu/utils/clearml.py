"""ClearML integration (reference: utils/callbacks/clearml.py).

Availability-gated: ImportError when clearml is absent."""

from __future__ import annotations

from clearml import Task

assert hasattr(Task, "current_task")

_TASK = None


def on_pretrain_routine_start(trainer) -> None:
    global _TASK
    _TASK = Task.current_task() or Task.init(
        project_name=str(getattr(trainer.args, "project", None) or "spectrogram_yolov11_tpu"),
        task_name=str(getattr(trainer.args, "name", None) or "train"),
        output_uri=True,
    )
    _TASK.connect(vars(trainer.args), name="General")


def on_fit_epoch_end(trainer) -> None:
    if _TASK is None:
        return
    step = int(getattr(trainer, "epoch", 0)) + 1
    logger = _TASK.get_logger()
    for series, vals in (("train", getattr(trainer, "label_loss", {})), ("val", getattr(trainer, "metrics", {}))):
        for k, v in (vals or {}).items():
            logger.report_scalar(series, k, float(v), iteration=step)


def on_train_end(trainer) -> None:
    global _TASK
    if _TASK is None:
        return
    from pathlib import Path

    best = getattr(trainer, "best", None)
    if best is not None and Path(str(best)).exists():
        _TASK.update_output_model(model_path=str(best), model_name="best", auto_delete_file=False)
    _TASK = None


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
