"""Local-registry HUB client (reference: ultralytics/hub/ + utils/callbacks/hub.py)."""

import json
from pathlib import Path
from types import SimpleNamespace

import numpy as np


def _patch_registry(tmp_path, monkeypatch):
    import spectrogram_yolov11_tpu.hub as hub

    monkeypatch.setitem(hub.SETTINGS, "hub_dir", str(tmp_path / "registry"))
    return hub


def test_session_metrics_and_model_upload(tmp_path, monkeypatch):
    hub = _patch_registry(tmp_path, monkeypatch)
    s = hub.HUBTrainingSession("det-1")
    s.upload_metrics(0, {"train/box_loss": 1.0, "fitness": 0.2})
    s.upload_metrics(1, {"train/box_loss": 0.8, "fitness": 0.3})
    rows = [json.loads(l) for l in (Path(s.model_url) / "metrics.jsonl").read_text().splitlines()]
    assert [r["heartbeat"] for r in rows] == [1, 2]
    assert rows[1]["fitness"] == 0.3

    ckpt = tmp_path / "last.ckpt"
    ckpt.write_bytes(b"weights")
    s.upload_model(1, str(ckpt))
    s.upload_model(1, str(ckpt), is_best=True, final=True)
    assert (Path(s.model_url) / "last.ckpt").read_bytes() == b"weights"
    assert (Path(s.model_url) / "best.ckpt").exists()

    hub.reset_model("det-1")
    assert not (Path(s.model_url) / "best.ckpt").exists()


def test_hub_callbacks_fire_with_session(tmp_path, monkeypatch):
    hub = _patch_registry(tmp_path, monkeypatch)
    from spectrogram_yolov11_tpu.utils.callbacks import default_callbacks, run_callbacks

    s = hub.HUBTrainingSession("det-2")
    ckpt = tmp_path / "last.ckpt"
    ckpt.write_bytes(b"w")
    t = SimpleNamespace(save_dir=tmp_path, args=SimpleNamespace(), epoch=0,
                        label_loss={"train/box_loss": 1.0}, metrics={"fitness": 0.1},
                        hub_session=s, last=ckpt, best=ckpt)
    cbs = default_callbacks()
    run_callbacks(cbs, "on_fit_epoch_end", t)
    run_callbacks(cbs, "on_model_save", t)
    run_callbacks(cbs, "on_train_end", t)
    d = Path(s.model_url)
    assert (d / "metrics.jsonl").exists() and (d / "last.ckpt").exists() and (d / "best.ckpt").exists()


def test_login_and_fmts(tmp_path, monkeypatch):
    hub = _patch_registry(tmp_path, monkeypatch)
    monkeypatch.setattr(hub.SETTINGS, "save", lambda: None)  # don't touch the real settings file
    assert hub.login("k3y") is True
    assert hub.SETTINGS.get("api_key") == "k3y"
    assert hub.Auth().authenticate()
    hub.logout()
    assert hub.SETTINGS.get("api_key") == ""
    fmts = hub.export_fmts_hub()
    assert "ckpt" in fmts and "stablehlo" in fmts
    assert hub.get_export("nope") == {"success": False, "files": []}


def test_check_dataset(tmp_path, monkeypatch):
    hub = _patch_registry(tmp_path, monkeypatch)
    hub.check_dataset("shapes128.yaml", task="detect")  # raises on failure


def test_export_model_roundtrip(tmp_path, monkeypatch):
    """hub.export_model runs the real exporter over a registered checkpoint
    and registers the artifact (reference hub/__init__.py:101)."""
    import shutil

    hub = _patch_registry(tmp_path, monkeypatch)
    s = hub.HUBTrainingSession("exp-1")
    shutil.copy2("runs_artifacts/spectrogram_yolo11n.ckpt", Path(s.model_url) / "best.ckpt")
    out = hub.export_model("exp-1", format="ckpt")
    assert out.exists()
    got = hub.get_export("exp-1")
    assert got["success"] and any(f.endswith(".ckpt") for f in got["files"])
