"""AutoBatch: XLA memory_analysis-driven batch search (reference autobatch.py:14,
redesigned for TPU; wired for batch=-1 in the trainer)."""

import numpy as np


def test_autobatch_picks_within_budget(monkeypatch):
    import spectrogram_yolov11_tpu.utils.autobatch as ab

    # fake memory model: each batch unit costs 1GB, device has 10GB
    monkeypatch.setattr(ab, "device_memory_bytes", lambda: 10 * 2**30)
    monkeypatch.setattr(ab, "estimate_step_memory", lambda lower, b: b * 2**30)
    best = ab.autobatch(step_lowerable=lambda b: None, fraction=0.60, start=1, max_batch=256)
    # 60% of 10GB = 6GB -> largest power-of-two batch <= 6 is 4
    assert best == 4

    # unmeasurable memory (None) falls back to the best so far
    monkeypatch.setattr(ab, "estimate_step_memory", lambda lower, b: None)
    assert ab.autobatch(step_lowerable=lambda b: None, start=8) == 8


def test_check_train_batch_size_real_model():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.utils.autobatch import check_train_batch_size

    m = build_model("yolo11n.yaml", nc=3, verbose=False)
    b = check_train_batch_size(m, imgsz=64, nc=3)
    assert isinstance(b, int) and b >= 1
