"""HUB session callbacks (reference: utils/callbacks/hub.py).

Attaches via the callback bus; does real work only when the trainer carries a
`hub_session` (a hub.HUBTrainingSession over the local registry — or a
networked subclass in a deployment that has one).
"""

from __future__ import annotations


def _session(trainer):
    return getattr(trainer, "hub_session", None)


def on_fit_epoch_end(trainer) -> None:
    s = _session(trainer)
    if s is None:
        return
    metrics = {**(getattr(trainer, "label_loss", {}) or {}), **(getattr(trainer, "metrics", {}) or {})}
    s.upload_metrics(int(getattr(trainer, "epoch", 0)), {k: _f(v) for k, v in metrics.items()})


def on_model_save(trainer) -> None:
    s = _session(trainer)
    if s is None:
        return
    last = getattr(trainer, "last", None)
    if last is not None:
        s.upload_model(int(getattr(trainer, "epoch", 0)), str(last))


def on_train_end(trainer) -> None:
    s = _session(trainer)
    if s is None:
        return
    best = getattr(trainer, "best", None)
    if best is not None:
        s.upload_model(int(getattr(trainer, "epoch", 0)), str(best), is_best=True, final=True)


def _f(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


callbacks = {
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_model_save": on_model_save,
    "on_train_end": on_train_end,
}
