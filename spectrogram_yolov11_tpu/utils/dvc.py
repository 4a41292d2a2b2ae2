"""DVCLive integration (reference: utils/callbacks/dvc.py).

Availability-gated: ImportError when dvclive is absent."""

from __future__ import annotations

import dvclive

assert hasattr(dvclive, "Live")

_LIVE = None


def on_pretrain_routine_start(trainer) -> None:
    global _LIVE
    _LIVE = dvclive.Live(save_dvc_exp=True, cache_images=True)
    _LIVE.log_params({k: v for k, v in vars(trainer.args).items() if isinstance(v, (int, float, str, bool))})


def on_fit_epoch_end(trainer) -> None:
    if _LIVE is None:
        return
    for k, v in {**(getattr(trainer, "label_loss", {}) or {}), **(getattr(trainer, "metrics", {}) or {})}.items():
        _LIVE.log_metric(k, float(v))
    _LIVE.next_step()


def on_train_end(trainer) -> None:
    global _LIVE
    if _LIVE is None:
        return
    from pathlib import Path

    best = getattr(trainer, "best", None)
    if best is not None and Path(str(best)).exists():
        _LIVE.log_artifact(str(best), copy=True, type="model")
    _LIVE.end()
    _LIVE = None


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
}
