"""Graph compiler + forward shape tests (fast, no oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogram_yolov11_tpu.nn.tasks import build_model, parse_model, yaml_model_load


def test_parse_yolo11n():
    d = yaml_model_load("yolo11n.yaml")
    specs, save, ch = parse_model(dict(d), 3, verbose=False)
    assert len(specs) == 24
    assert save == [4, 6, 10, 13, 16, 19, 22]
    assert ch[-2] == 256  # P5 width at n-scale: 1024*0.25


@pytest.fixture(scope="module")
def model_and_vars():
    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    return m, v


def test_stride_calibration(model_and_vars):
    m, _ = model_and_vars
    assert list(m.stride) == [8.0, 16.0, 32.0]


def test_param_count_matches_reference(model_and_vars):
    # reference yolo11n: 2,624,080 params incl. 16 frozen DFL weights (pure fn here)
    m, v = model_and_vars
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 2_624_080 - 16


def test_forward_shapes(model_and_vars):
    # heads emit per-level (box 4*reg_max, cls nc) pairs — ops.decode.split_feats
    # documents why the reference's packed 144-channel map is avoided on TPU
    m, v = model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    expect = [((2, 8, 8, 64), (2, 8, 8, 80)), ((2, 4, 4, 64), (2, 4, 4, 80)), ((2, 2, 2, 64), (2, 2, 2, 80))]
    out = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    assert [(b.shape, c.shape) for b, c in out] == expect
    # train mode returns (out, new_batch_stats)
    out_t, bs = jax.jit(lambda v, x: m.apply(v, x, train=True))(v, x)
    assert [(b.shape, c.shape) for b, c in out_t] == expect
    assert set(bs.keys()) == set(v["batch_stats"].keys())


def test_bias_init_values(model_and_vars):
    m, v = model_and_vars
    head = v["params"]["model_23"]
    assert float(head["cv2_0_2"]["bias"][0]) == 1.0
    np.testing.assert_allclose(
        float(head["cv3_0_2"]["bias"][0]), np.log(5 / 80 / (640 / 8) ** 2), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(head["cv3_2_2"]["bias"][0]), np.log(5 / 80 / (640 / 32) ** 2), rtol=1e-6
    )


def test_scales_build():
    # scale parsing only (no init -> no compile): s-scale widths double n-scale
    m = build_model("yolo11s.yaml", verbose=False)
    assert list(m.stride) == [8.0, 16.0, 32.0]
    assert m.specs[0].args[1] == 32  # 64 * 0.50


def test_predictor_reused_across_predict_calls():
    """Repeated predict() with identical args must reuse the predictor (and
    its compiled device program) — reference engine/model.py:549; rebuilding
    per call would re-jit every time. Changed args rebuild."""
    from spectrogram_yolov11_tpu.engine.model import YOLO

    m = YOLO("yolo11n.yaml")
    img = np.zeros((64, 80, 3), np.uint8)
    m.predict(img, imgsz=64)
    first = m.predictor
    m.predict(img, imgsz=64)
    assert m.predictor is first
    m.predict(img, imgsz=64, conf=0.9)  # changed NMS threshold -> rebuild
    assert m.predictor is not first
