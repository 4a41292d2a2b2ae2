"""Ray Tune integration (reference: utils/callbacks/raytune.py): reports
metrics+epoch to a live Tune session each fit epoch. Availability-gated."""

from __future__ import annotations

import ray
from ray import train, tune  # noqa: F401

assert hasattr(ray, "is_initialized")


def on_fit_epoch_end(trainer) -> None:
    try:
        in_session = ray.train._internal.session.get_session()
    except Exception:
        in_session = None
    if not in_session:
        return
    metrics = dict(getattr(trainer, "metrics", {}) or {})
    metrics["epoch"] = int(getattr(trainer, "epoch", 0)) + 1
    train.report(metrics)


callbacks = {"on_fit_epoch_end": on_fit_epoch_end}
