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
