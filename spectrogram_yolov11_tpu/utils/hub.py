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


def _event(obj) -> None:
    """Queue an anonymous usage event for any engine start hook (reference
    utils/callbacks/hub.py:76-91 wires events() to the same four hooks)."""
    args = getattr(obj, "args", None)
    if args is not None:
        EVENTS(args)


callbacks = {
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_model_save": on_model_save,
    "on_train_end": on_train_end,
    "on_train_start": _event,
    "on_val_start": _event,
    "on_predict_start": _event,
    "on_export_start": _event,
}


class Events:
    """Anonymous usage-event analytics (reference: hub/utils.py:167 Events).

    The reference batches {task, model, mode} events and POSTs them to GA4,
    gated on SETTINGS['sync'] and a 30 s rate limit. This zero-egress build
    keeps the exact queue/rate-limit semantics but sinks flushed batches to
    `<hub registry>/events.jsonl` — a networked deployment overrides
    `_send(batch)`. Disabled by default (SETTINGS['sync'] is False here).
    """

    def __init__(self):
        import platform
        import random
        import sys
        from pathlib import Path

        from spectrogram_yolov11_tpu import __version__
        from spectrogram_yolov11_tpu.utils import SETTINGS

        self.events: list = []
        self.rate_limit = 30.0  # seconds between flushes
        self.t = 0.0
        self.metadata = {
            "cli": Path(sys.argv[0]).name in {"yolo", "syt"},
            "python": ".".join(platform.python_version_tuple()[:2]),
            "version": __version__,
            "session_id": round(random.random() * 1e15),
            "engagement_time_msec": 1000,
        }
        self.enabled = bool(SETTINGS.get("sync"))

    def _send(self, batch: list) -> None:
        """Sink one flushed batch; local registry jsonl here, HTTP in a
        networked subclass."""
        import json

        from spectrogram_yolov11_tpu.hub import registry_dir

        out = registry_dir() / "events.jsonl"
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "a", encoding="utf-8") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    def __call__(self, cfg) -> None:
        """Queue one event for `cfg` (mode/task/model/format) and flush when
        the rate limit allows — same 25-event cap and timer reset as the
        reference."""
        import time

        if not self.enabled:
            return
        if len(self.events) < 25:
            params = {
                **self.metadata,
                "task": getattr(cfg, "task", None),
                "model": getattr(cfg, "model", None),
            }
            if getattr(cfg, "mode", None) == "export":
                params["format"] = getattr(cfg, "format", None)
            self.events.append({"name": getattr(cfg, "mode", None), "params": params})
        t = time.time()
        if t - self.t < self.rate_limit:
            return
        self._send(self.events)
        self.events = []
        self.t = t


EVENTS = Events()
