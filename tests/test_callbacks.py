"""Callback bus + logger integrations (reference utils/callbacks/base.py:187
auto-attach; tensorboard.py; dvc-style metrics logging)."""

import json
from types import SimpleNamespace

from spectrogram_yolov11_tpu.utils.callbacks import EVENTS, default_callbacks, run_callbacks


def _dummy_trainer(tmp_path):
    return SimpleNamespace(
        save_dir=tmp_path,
        args=SimpleNamespace(epochs=2, lr0=0.01, model="yolo11n.yaml", project=None, name=None),
        epoch=0,
        label_loss={"train/box_loss": 1.5, "train/cls_loss": 2.0},
        metrics={"metrics/mAP50-95(B)": 0.3, "fitness": 0.31},
    )


def test_integrations_attach():
    """At least the dependency-free jsonl + tensorboard integrations attach;
    gated ones (wandb/mlflow, not in this image) skip without error."""
    cbs = default_callbacks()
    assert set(cbs) == set(EVENTS)
    attached = {e: len(v) for e, v in cbs.items() if v}
    assert attached.get("on_fit_epoch_end", 0) >= 2  # jsonl + tb


def test_jsonl_logger_roundtrip(tmp_path):
    cbs = default_callbacks()
    t = _dummy_trainer(tmp_path)
    run_callbacks(cbs, "on_train_start", t)
    run_callbacks(cbs, "on_fit_epoch_end", t)
    t.epoch = 1
    t.label_loss = {"train/box_loss": 1.2, "train/cls_loss": 1.7}
    run_callbacks(cbs, "on_fit_epoch_end", t)
    run_callbacks(cbs, "on_train_end", t)

    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in rows] == [1, 2]
    assert rows[1]["train/box_loss"] == 1.2 and rows[0]["fitness"] == 0.31
    args = json.loads((tmp_path / "args.json").read_text())
    assert args["model"] == "yolo11n.yaml"


def test_new_logger_integrations_attach_with_fake_sdks(monkeypatch):
    """comet/clearml/dvc/neptune integrations attach when their SDK imports
    (faked here; none ship in this image) and fire on the trainer events
    (reference utils/callbacks/{comet,clearml,dvc,neptune}.py)."""
    import importlib
    import sys
    import types

    calls = []

    class _Rec:
        def __init__(self, name):
            self.name = name

        def __call__(self, *a, **k):
            calls.append(self.name)
            return self

        def __getattr__(self, item):
            return _Rec(f"{self.name}.{item}")

        def __setitem__(self, k, v):
            calls.append(f"{self.name}[{k}]=")

    fake_comet = types.ModuleType("comet_ml")
    fake_comet.__version__ = "3.0"
    fake_comet.Experiment = _Rec("comet.Experiment")
    monkeypatch.setitem(sys.modules, "comet_ml", fake_comet)

    import spectrogram_yolov11_tpu.utils.comet as comet_cb

    importlib.reload(comet_cb)
    t = types.SimpleNamespace(args=types.SimpleNamespace(project="p", name="n"),
                              epoch=0, label_loss={"train/box_loss": 1.0}, metrics={"fitness": 0.5},
                              best=None, save_dir=".")
    comet_cb.on_pretrain_routine_start(t)
    comet_cb.on_fit_epoch_end(t)
    assert any("Experiment" in c for c in calls)
    assert any("log_metrics" in c for c in calls)


def test_ray_tune_gated():
    import pytest as _pytest

    from spectrogram_yolov11_tpu.engine.model import YOLO

    y = YOLO("yolo11n.yaml")
    with _pytest.raises(ModuleNotFoundError, match="ray"):
        y.tune(use_ray=True, data="spectrogram_synth.yaml", epochs=1)
