"""Neptune.ai integration (reference: utils/callbacks/neptune.py).

Availability-gated: ImportError when neptune is absent."""

from __future__ import annotations

import neptune

assert hasattr(neptune, "init_run")

_RUN = None


def on_pretrain_routine_start(trainer) -> None:
    global _RUN
    _RUN = neptune.init_run(
        project=str(getattr(trainer.args, "project", None) or "spectrogram_yolov11_tpu"),
        name=str(getattr(trainer.args, "name", None) or "train"),
    )
    _RUN["Configuration/Hyperparameters"] = {
        k: ("" if v is None else v) for k, v in vars(trainer.args).items()
    }


def on_fit_epoch_end(trainer) -> None:
    if _RUN is None:
        return
    step = int(getattr(trainer, "epoch", 0)) + 1
    for k, v in {**(getattr(trainer, "label_loss", {}) or {}), **(getattr(trainer, "metrics", {}) or {})}.items():
        _RUN[k].append(value=float(v), step=step)


def on_train_end(trainer) -> None:
    global _RUN
    if _RUN is None:
        return
    from pathlib import Path

    best = getattr(trainer, "best", None)
    if best is not None and Path(str(best)).exists():
        _RUN[f"weights/{Path(str(best)).name}"].upload(str(best))
    _RUN.stop()
    _RUN = None


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
