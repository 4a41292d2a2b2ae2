import numpy as np

def test_gray_upload_identical():
    """_maybe_gray ships 1 channel for gray-replicated frames; detections are
    bit-identical to the full-RGB upload (engine/predictor.py)."""
    import jax.numpy as jnp
    from spectrogram_yolov11_tpu.engine.predictor import BasePredictor, _maybe_gray
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    import jax

    g = np.random.default_rng(0).integers(0, 255, (120, 160, 1), np.uint8)
    frame = np.repeat(g, 3, axis=2)
    rgbish = frame.copy(); rgbish[5, 5, 0] += 1  # break replication

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=160)
    p = BasePredictor(m, v, overrides=dict(imgsz=160, conf=0.001, verbose=False))

    r_gray = p([frame], batch_size=1)
    # force the full-RGB path via a non-replicated frame of the same content scale
    assert _maybe_gray(np.stack([frame])).shape[-1] == 1
    assert _maybe_gray(np.stack([rgbish])).shape[-1] == 3

    # bypass auto-detection to compare both device programs on identical pixels
    batch3 = p.preprocess([frame])
    out3, nv3 = p._device_fn(p.variables, jnp.asarray(batch3))
    out1, nv1 = p._device_fn(p.variables, jnp.asarray(np.ascontiguousarray(batch3[..., :1])))
    np.testing.assert_array_equal(np.asarray(nv3), np.asarray(nv1))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out1), atol=0)
    assert len(r_gray) == 1


def test_tta_augment_predict():
    """augment=True runs the 3-scale TTA program (reference tasks.py:377):
    finite outputs, same result surface as the single-scale path."""
    import jax
    from spectrogram_yolov11_tpu.engine.predictor import BasePredictor
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    img = np.random.default_rng(1).integers(0, 255, (100, 128, 3), np.uint8)
    r_tta = BasePredictor(m, v, overrides=dict(imgsz=128, conf=0.001, augment=True))([img])
    r_std = BasePredictor(m, v, overrides=dict(imgsz=128, conf=0.001))([img])
    assert len(r_tta) == len(r_std) == 1
    assert r_tta[0].boxes.data.shape[1] == 6
    assert np.isfinite(r_tta[0].boxes.data).all()


def test_ensemble_predict():
    """YOLO([a, b]) NMS-ensembles two detect models in one jitted program
    (reference nn/tasks.py:718 Ensemble)."""
    from spectrogram_yolov11_tpu.engine.model import YOLO

    y = YOLO(["yolo11n.yaml", "yolov8n.yaml"])
    assert y._ensemble is not None and len(y._ensemble) == 2
    img = np.random.default_rng(2).integers(0, 255, (96, 128, 3), np.uint8)
    res = y.predict([img], conf=0.001, imgsz=128)
    assert len(res) == 1 and res[0].boxes.data.shape[1] == 6
    assert np.isfinite(res[0].boxes.data).all()


def test_save_crop_and_plot_flags(tmp_path):
    """save_crop writes per-class crops; show_labels/show_conf/line_width wire
    through to plotting (reference results.py save_crop, predictor save path)."""
    import jax
    from spectrogram_yolov11_tpu.engine.predictor import BasePredictor
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    img = np.random.default_rng(3).integers(0, 255, (96, 128, 3), np.uint8)
    p = BasePredictor(m, v, overrides=dict(
        imgsz=128, conf=0.0005, save=True, save_crop=True, show_labels=False,
        project=str(tmp_path), name="pred", exist_ok=True))
    res = p([img])
    assert (tmp_path / "pred").exists()
    if len(res[0].boxes.data):  # random net: detections exist at conf 5e-4
        crops = list((tmp_path / "pred" / "crops").rglob("*.jpg"))
        assert crops


def test_visualize_feature_maps(tmp_path):
    """visualize=True saves per-stage feature grids (reference plotting.py:1347)."""
    import jax
    from spectrogram_yolov11_tpu.engine.predictor import BasePredictor
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    img = np.random.default_rng(4).integers(0, 255, (96, 128, 3), np.uint8)
    p = BasePredictor(m, v, overrides=dict(imgsz=128, conf=0.25, visualize=True,
                                           project=str(tmp_path), name="viz", exist_ok=True))
    p([img])
    pngs = list((tmp_path / "viz" / "features").glob("*.png"))
    assert pngs, "no feature maps saved"


def test_save_video_and_frames(tmp_path):
    """save=True on a video source writes an annotated .mp4 (+ frames with
    save_frames=True) instead of overwriting one jpg per frame."""
    import cv2
    import jax
    from spectrogram_yolov11_tpu.engine.predictor import BasePredictor
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    src = tmp_path / "clip.mp4"
    wr = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    for t in range(4):
        wr.write(np.full((96, 128, 3), 40 + 30 * t, np.uint8))
    wr.release()

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    p = BasePredictor(m, v, overrides=dict(imgsz=128, conf=0.25, save=True, save_frames=True,
                                           project=str(tmp_path), name="vid", exist_ok=True))
    res = p(str(src))
    assert len(res) == 4
    assert (tmp_path / "vid" / "clip.mp4").exists()
    assert len(list((tmp_path / "vid" / "clip_frames").glob("*.jpg"))) == 4


def test_half_predict_bf16():
    """half=True switches the predictor's device program to bf16 compute
    (reference half=fp16, predictor.py:118); results stay close to f32."""
    import jax
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.engine.predictor import BasePredictor
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=96)
    img = np.random.default_rng(2).integers(0, 255, (80, 96, 3), np.uint8)

    r32 = BasePredictor(m, v, overrides=dict(imgsz=96, conf=0.001))([img])
    assert m.dtype in (None, jnp.float32)
    r16 = BasePredictor(m, v, overrides=dict(imgsz=96, conf=0.001, half=True))([img])
    assert m.dtype == jnp.bfloat16
    assert np.isfinite(r16[0].boxes.data).all()
    # same anchors survive at this loose conf; geometry within bf16 tolerance
    a, b = r32[0].boxes.data, r16[0].boxes.data
    n = min(len(a), len(b))
    if n:
        np.testing.assert_allclose(a[:n, :4], b[:n, :4], atol=4.0)
    m.set_dtype(jnp.float32)  # restore for any shared fixtures
