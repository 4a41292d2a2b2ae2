"""Weights & Biases integration (reference: utils/callbacks/wb.py).

Availability-gated: importing this module raises ImportError when wandb is
not installed (this TPU image ships without it), and the callback bus simply
skips it — identical behavior to the reference's try/assert gate.
"""

from __future__ import annotations

from pathlib import Path

import wandb as wb

assert hasattr(wb, "__version__")

_RUN = None


def on_pretrain_routine_start(trainer) -> None:
    global _RUN
    _RUN = wb.run or wb.init(
        project=str(getattr(trainer.args, "project", None) or "spectrogram_yolov11_tpu"),
        name=str(getattr(trainer.args, "name", None) or "train"),
        config=vars(trainer.args),
    )


def on_fit_epoch_end(trainer) -> None:
    if _RUN is None:
        return
    step = int(getattr(trainer, "epoch", 0)) + 1
    _RUN.log(dict(getattr(trainer, "label_loss", {}) or {}), step=step)
    _RUN.log(dict(getattr(trainer, "metrics", {}) or {}), step=step)


def on_train_end(trainer) -> None:
    global _RUN
    if _RUN is None:
        return
    best = getattr(trainer, "best", None)
    if best is not None and Path(str(best)).exists():
        art = wb.Artifact(type="model", name=f"run_{_RUN.id}_model")
        art.add_file(str(best), name="best.ckpt")
        _RUN.log_artifact(art, aliases=["best", "last"])
    _RUN.finish()
    _RUN = None


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
