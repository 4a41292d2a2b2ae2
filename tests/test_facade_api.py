"""YOLO facade API parity: the callback bus on the facade, weight transfer
(`load`), `reset_weights`, `device`/`eval`/`transforms` compat surface
(reference engine/model.py:288-996; callback usage modeled on
reference tests/test_python.py:239 test_callbacks)."""

import numpy as np
import pytest


def _img(seed=0, shape=(100, 128, 3)):
    return np.random.default_rng(seed).integers(0, 255, shape, np.uint8)


def test_add_callback_fires_on_predict():
    from spectrogram_yolov11_tpu.engine.model import YOLO

    y = YOLO("yolo11n.yaml")
    seen = []
    y.add_callback("on_predict_start", lambda p: seen.append("start"))
    y.add_callback("on_predict_batch_start", lambda p: seen.append("bstart"))
    y.add_callback("on_predict_postprocess_end", lambda p: seen.append("post"))
    y.add_callback("on_predict_batch_end", lambda p: seen.append("bend"))
    y.add_callback("on_predict_end", lambda p: seen.append("end"))
    y.predict([_img()], imgsz=128, verbose=False)
    assert seen == ["start", "bstart", "post", "bend", "end"]

    # the hook sees the predictor, with results populated at postprocess_end
    probe = {}
    y.add_callback("on_predict_postprocess_end", lambda p: probe.setdefault("n", len(p.results)))
    y.predict([_img()], imgsz=128, verbose=False)  # cached-predictor path
    assert probe["n"] == 1

    # clear_callback takes effect on the already-built (cached) predictor too
    y.clear_callback("on_predict_batch_end")
    seen.clear()
    y.predict([_img()], imgsz=128, verbose=False)
    assert "bend" not in seen and "start" in seen

    y.reset_callbacks()
    seen.clear()
    y.predict([_img()], imgsz=128, verbose=False)
    assert seen == []


def test_load_transfers_matching_weights(tmp_path):
    from spectrogram_yolov11_tpu.engine.model import YOLO
    import jax

    donor = YOLO("yolo11n.yaml")
    donor._ensure_variables()
    # make the donor distinguishable from a fresh init
    donor.variables = jax.tree_util.tree_map(lambda x: x + 1.0 if x.dtype.kind == "f" else x, donor.variables)
    ckpt = tmp_path / "donor.ckpt"
    donor.save(ckpt)

    y = YOLO("yolo11n.yaml").load(ckpt)
    d_leaves = jax.tree_util.tree_leaves(donor.variables)
    y_leaves = jax.tree_util.tree_leaves(y.variables)
    assert all(np.allclose(a, b) for a, b in zip(d_leaves, y_leaves))

    # reset_weights restores the deterministic fresh init
    y.reset_weights()
    fresh = YOLO("yolo11n.yaml")
    fresh._ensure_variables()
    f_leaves = jax.tree_util.tree_leaves(fresh.variables)
    r_leaves = jax.tree_util.tree_leaves(y.variables)
    assert all(np.allclose(a, b) for a, b in zip(f_leaves, r_leaves))


def test_load_partial_transfer_mismatched_head(tmp_path):
    """nc mismatch: backbone leaves transfer, head cls leaves keep their init
    (reference transfer-learning semantics, torch_utils.py:454 intersect_dicts)."""
    from spectrogram_yolov11_tpu.engine.model import YOLO, _intersect_variables
    import jax

    donor = YOLO("yolo11n.yaml")  # nc=80
    donor._ensure_variables()
    ckpt = tmp_path / "donor80.ckpt"
    donor.save(ckpt)

    from spectrogram_yolov11_tpu.nn.tasks import build_model, yaml_model_load

    d = yaml_model_load("yolo11n.yaml")
    y = YOLO("yolo11n.yaml")
    y.model = build_model(d, nc=2, verbose=False, task="detect")
    y._ensure_variables()
    before = jax.tree_util.tree_leaves(y.variables)
    _, n = _intersect_variables(y.variables, donor.variables)
    assert 0 < n < len(before)  # some but not all leaves match
    y.load(ckpt)  # must not raise despite the head shape mismatch
    img = _img(shape=(96, 128, 3))
    assert len(y.predict([img], imgsz=128, verbose=False)) == 1


def test_device_eval_transforms():
    from spectrogram_yolov11_tpu.engine.model import YOLO

    y = YOLO("yolo11n.yaml")
    assert y.eval() is y
    assert y.transforms is None
    dev = y.device
    assert isinstance(dev, str) and dev


def test_val_callbacks_fire(tmp_path):
    """on_val_start/on_val_end fire through model.val (classify: cheapest)."""
    import cv2
    from spectrogram_yolov11_tpu.engine.model import YOLO

    root = tmp_path / "cls" / "val"
    for c in ("a", "b"):
        (root / c).mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(root / c / f"{i}.jpg"), _img(i, (64, 64, 3)))
    y = YOLO("yolo11n-cls.yaml", task="classify")
    seen = []
    y.add_callback("on_val_start", lambda v: seen.append("start"))
    y.add_callback("on_val_end", lambda v: seen.append("end"))
    y.val(data=str(tmp_path / "cls"), imgsz=64, batch=2, verbose=False)
    assert seen == ["start", "end"]


def test_enable_compile_cache_sets_jax_flags():
    """SETTINGS['compile_cache'] drives the persistent XLA compile cache used
    by serving and the CLI (cold-restart skip of the first-jit compile)."""
    import jax

    from spectrogram_yolov11_tpu.utils import SETTINGS, enable_compile_cache

    assert SETTINGS.get("compile_cache")
    enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == SETTINGS["compile_cache"]
