"""Exporter + AutoBackend round-trips and utils (checks/autobatch/tuner surfaces)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from spectrogram_yolov11_tpu.engine.model import YOLO


@pytest.fixture(scope="module")
def small_model(tmp_path_factory):
    m = YOLO("yolo11n.yaml")
    m._ensure_variables()
    return m


def test_export_ckpt_roundtrip(small_model, tmp_path):
    path = small_model.export(format="ckpt", save_dir=str(tmp_path), imgsz=64)
    assert Path(path).exists()
    m2 = YOLO(path)
    assert m2.model.nc == small_model.model.nc
    # same weights -> same forward
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3))
    a = small_model.model.apply(small_model.variables, x)
    b = m2.model.apply(m2.variables, x)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)


def test_export_stablehlo(small_model, tmp_path):
    path = small_model.export(format="stablehlo", save_dir=str(tmp_path), imgsz=64, batch=1)
    text = Path(path).read_text()
    assert "stablehlo" in text or "module" in text  # MLIR module emitted
    assert Path(path).with_suffix(".ckpt").exists()


def test_autobackend_formats(small_model, tmp_path):
    from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

    ckpt = small_model.export(format="ckpt", save_dir=str(tmp_path), imgsz=64)
    for weights in ["yolo11n.yaml", ckpt]:
        backend = AutoBackend(weights)
        out = backend.forward(np.zeros((1, 64, 64, 3), np.uint8))
        assert np.asarray(out).shape == (1, 84, 84) or np.asarray(out).shape[0] == 1


def test_export_bad_format_raises(small_model, tmp_path):
    with pytest.raises(ValueError):
        small_model.export(format="not_a_format", save_dir=str(tmp_path))


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["find_spec"]).find_spec("tensorflow") is None,
    reason="tensorflow not installed",
)
def test_export_saved_model_and_infer(small_model, tmp_path):
    """jax2tf SavedModel export + AutoBackend inference on it."""
    from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

    path = small_model.export(format="saved_model", save_dir=str(tmp_path), imgsz=64)
    backend = AutoBackend(path)
    out = np.asarray(backend.forward(np.zeros((1, 64, 64, 3), np.uint8)))
    assert out.shape[0] == 1 and out.shape[-2:] == (84, 84) or out.ndim == 3


def test_checks():
    from spectrogram_yolov11_tpu.utils.checks import check_imgsz, check_version, collect_system_info

    assert check_imgsz(630, stride=32) == 640
    assert check_version("2.1.0", ">=2.0")
    assert not check_version("1.9", ">=2.0")
    info = collect_system_info()
    assert "jax" in info
