"""Comet ML integration (reference: utils/callbacks/comet.py).

Availability-gated like the reference: ImportError when comet_ml is absent
and the callback bus skips it."""

from __future__ import annotations

import comet_ml

assert hasattr(comet_ml, "__version__")

_EXP = None


def on_pretrain_routine_start(trainer) -> None:
    global _EXP
    _EXP = comet_ml.Experiment(project_name=str(getattr(trainer.args, "project", None) or "spectrogram_yolov11_tpu"))
    _EXP.set_name(str(getattr(trainer.args, "name", None) or "train"))
    _EXP.log_parameters(vars(trainer.args))


def on_fit_epoch_end(trainer) -> None:
    if _EXP is None:
        return
    step = int(getattr(trainer, "epoch", 0)) + 1
    _EXP.log_metrics(dict(getattr(trainer, "label_loss", {}) or {}), step=step)
    _EXP.log_metrics(dict(getattr(trainer, "metrics", {}) or {}), step=step)


def on_train_end(trainer) -> None:
    global _EXP
    if _EXP is None:
        return
    from pathlib import Path

    best = getattr(trainer, "best", None)
    if best is not None and Path(str(best)).exists():
        _EXP.log_model("best", str(best))
    for png in Path(trainer.save_dir).glob("*.png"):
        _EXP.log_image(str(png), name=png.stem)
    _EXP.end()
    _EXP = None


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
