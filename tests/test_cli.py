"""CLI entrypoint tests (reference: tests/test_cli.py — subprocess `yolo`
commands; here we call entrypoint() in-process to stay on the CPU backend)."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.cfg import entrypoint, parse_key_value_pairs


def test_parse_kv():
    out = parse_key_value_pairs(["imgsz=320", "lr0=0.01", "save=False", "name=exp", "classes=[0,1]"])
    assert out == {"imgsz": 320, "lr0": 0.01, "save": False, "name": "exp", "classes": [0, 1]}


def test_entrypoint_help_and_version(capsys):
    assert entrypoint("yolo help") is None
    assert entrypoint("yolo version") is None
    assert entrypoint("yolo checks") is None


def test_entrypoint_bad_arg():
    with pytest.raises(SyntaxError):
        entrypoint("yolo notacommand")
    with pytest.raises(SyntaxError):
        entrypoint("yolo detect train lr=0.01")  # typo'd key -> did-you-mean


def test_entrypoint_train_smoke(tmp_path):
    metrics = entrypoint(
        "yolo detect train model=yolo11n.yaml data=shapes128.yaml epochs=1 imgsz=160 batch=4 "
        f"workers=2 close_mosaic=0 project={tmp_path} name=cli exist_ok=True plots=False save=False"
    )
    assert "fitness" in metrics


def test_entrypoint_predict(tmp_path):
    res = entrypoint(
        f"yolo predict model=yolo11n.yaml source=/root/repo/datasets/shapes128/images/val/00000.jpg "
        f"imgsz=160 project={tmp_path} name=clipred exist_ok=True save=False"
    )
    assert isinstance(res, list) and len(res) == 1


def test_cli_solutions_verb(caplog):
    """`yolo solutions list` + instantiation dispatch (reference
    handle_yolo_solutions)."""
    from spectrogram_yolov11_tpu.cfg import entrypoint

    assert entrypoint("yolo solutions list") is None
    app = entrypoint("yolo solutions ObjectCounter model=yolo11n.yaml")
    from spectrogram_yolov11_tpu.solutions import ObjectCounter

    assert isinstance(app, ObjectCounter)


def test_rect_rejected_with_warning():
    """rect=True (aspect-bucketed batches) is a documented TPU deviation:
    it must not silently alter shapes — get_cfg resets it and warns."""
    from spectrogram_yolov11_tpu.cfg import get_cfg

    c = get_cfg(overrides={"rect": True})
    assert c.rect is False


def test_entrypoint_special_verbs(tmp_path, monkeypatch):
    """cfg / copy-cfg / settings [k=v|reset] / login / logout / hub login
    (reference cfg/__init__.py special dict :855)."""
    monkeypatch.chdir(tmp_path)

    assert entrypoint("yolo cfg") is None

    assert entrypoint("yolo copy-cfg") is None
    copies = list(tmp_path.glob("*_copy.yaml"))
    assert len(copies) == 1 and "task:" in copies[0].read_text()

    from spectrogram_yolov11_tpu.utils import SETTINGS

    monkeypatch.setattr(SETTINGS, "file", tmp_path / "settings.json")
    assert entrypoint("yolo settings sync=True") is None
    assert SETTINGS["sync"] is True and (tmp_path / "settings.json").exists()
    assert entrypoint("yolo settings reset") is None
    assert SETTINGS["sync"] is False
    with pytest.raises(SyntaxError):
        entrypoint("yolo settings nota_key=1")

    assert entrypoint("yolo login") is None
    assert entrypoint("yolo hub login") is None
    assert entrypoint("yolo logout") is None
