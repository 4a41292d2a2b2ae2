"""Tuner evolution loop + Tuner._mutate unit behavior (reference tuner.py:33)
and the benchmark() format sweep (reference benchmarks.py:51)."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.engine.tuner import SPACE, Tuner


def test_mutate_respects_bounds(tmp_path):
    t = Tuner(overrides=dict(task="detect", mode="train", project=str(tmp_path), name="t", exist_ok=True))
    parent = {k: (lo + hi) / 2 for k, (lo, hi) in SPACE.items()}
    for _ in range(10):
        child = t._mutate(parent)
        assert child != parent
        for k, (lo, hi) in SPACE.items():
            assert lo <= child[k] <= hi


@pytest.mark.slow
def test_tuner_evolution_smoke(tmp_path):
    """2 mutate->train->fitness iterations write tune_results.csv rows."""
    t = Tuner(overrides=dict(
        task="detect", mode="train", data="shapes128.yaml", model="yolo11n.yaml",
        imgsz=64, batch=2, nbs=2, epochs=1, workers=0, fraction=0.1, val=True,
        save=False, plots=False, mosaic=0.0, close_mosaic=0,
        project=str(tmp_path), name="tune", exist_ok=True))
    from spectrogram_yolov11_tpu import YOLO

    t(model=YOLO("yolo11n.yaml"), iterations=2)
    import csv as _csv

    rows = list(_csv.DictReader(open(t.csv)))
    assert len(rows) == 2
    assert all("fitness" in r for r in rows)
    # evolution plots (reference utils/plotting.py plot_tune_results)
    assert (t.tune_dir / "tune_scatter_plots.png").exists()
    assert (t.tune_dir / "tune_fitness.png").exists()


@pytest.mark.slow
def test_benchmark_sweep(tmp_path, monkeypatch):
    """benchmark() runs every available format through export+predict+val and
    reports a status row per format."""
    monkeypatch.chdir(tmp_path)
    from spectrogram_yolov11_tpu import YOLO
    from spectrogram_yolov11_tpu.utils.benchmarks import benchmark

    rows = benchmark(model=YOLO("yolo11n.yaml"), data="shapes128.yaml", imgsz=64, verbose=False)
    fmts = {r["format"] for r in rows}
    assert {"ckpt", "stablehlo"} <= fmts
    ok = [r for r in rows if r["status"] == "ok"]
    assert ok, f"no format succeeded: {rows}"
