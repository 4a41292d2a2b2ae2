"""Callback bus (reference: utils/callbacks/base.py:144-217).

The same ~25-event dict surface; integrations attach by appending callables.
Built-in integrations land incrementally (tensorboard/csv are native; heavy
third-party loggers are availability-gated)."""

from __future__ import annotations

from typing import Callable, Dict, List

EVENTS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_postprocess_end",
    "on_predict_batch_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]


def default_callbacks() -> Dict[str, List[Callable]]:
    cbs: Dict[str, List[Callable]] = {e: [] for e in EVENTS}
    _attach_integrations(cbs)
    return cbs


def run_callbacks(callbacks: Dict[str, List[Callable]], event: str, obj) -> None:
    for fn in callbacks.get(event, []):
        fn(obj)


def add_integration_callbacks(callbacks: Dict[str, List[Callable]]) -> None:
    _attach_integrations(callbacks)


# integration modules, each exporting a `callbacks` event->fn dict; import
# failure = integration unavailable, silently skipped (reference base.py:187)
_INTEGRATIONS = (".jsonl", ".tb", ".wb", ".mlflow", ".hub", ".comet", ".clearml", ".dvc", ".neptune", ".raytune")


def _attach_integrations(cbs: Dict[str, List[Callable]]) -> None:
    import importlib

    for mod in _INTEGRATIONS:
        try:
            m = importlib.import_module(mod, package=__package__)
        except (ImportError, AssertionError):
            continue
        for k, v in m.callbacks.items():
            if v not in cbs[k]:
                cbs[k].append(v)
