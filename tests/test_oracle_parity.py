"""Golden-numerics tests: our NHWC/flax forward vs the reference torch
implementation with identical (converted) weights. This is the strongest
correctness gate available offline (no pretrained weights in the image):
random-init reference model -> convert state_dict -> compare raw head maps.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from spectrogram_yolov11_tpu.nn.tasks import build_model  # noqa: E402
from spectrogram_yolov11_tpu.utils.torch_compat import (  # noqa: E402
    load_state_into_variables,
    torch_state_to_variables,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_model():
    from oracle import torch_detection_model

    return torch_detection_model("yolo11n.yaml", nc=80, seed=3)


@pytest.fixture(scope="module")
def jx(ref_model):
    m = build_model("yolo11n.yaml", verbose=False)
    v = m.init(jax.random.PRNGKey(0))
    state = {k: p.detach().numpy() for k, p in ref_model.state_dict().items()}
    conv = torch_state_to_variables(state, head_layer="model_23", head_task="detect")
    v = load_state_into_variables(v, conv, strict=True)
    return m, v


def _torch_raw(ref_model, x_nchw):
    with torch.no_grad():
        ref_model.train()
        for mod in ref_model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.eval()
        out = ref_model(torch.from_numpy(x_nchw))
        ref_model.eval()
    return [o.numpy() for o in out]


def test_forward_parity_raw_feats(ref_model, jx):
    m, v = jx
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 96, 96), dtype=np.float32) * 0.5 + 0.25
    ref = _torch_raw(ref_model, x)  # list of (B, no, H, W)
    from spectrogram_yolov11_tpu.ops.decode import concat_feats

    ours = concat_feats(jax.jit(lambda v, x: m.apply(v, x))(v, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert len(ref) == len(ours)
    for r, o in zip(ref, ours):
        o_nchw = np.asarray(o).transpose(0, 3, 1, 2)
        assert r.shape == o_nchw.shape
        np.testing.assert_allclose(o_nchw, r, atol=2e-4, rtol=2e-3)


def test_forward_parity_decoded(ref_model, jx):
    """Decoded (xywh-pixels + sigmoid cls) inference output parity."""
    from spectrogram_yolov11_tpu.ops.decode import decode_detections

    m, v = jx
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.3
    with torch.no_grad():
        ref_model.eval()
        y_ref = ref_model(torch.from_numpy(x))[0].numpy()  # (1, 4+nc, A)
    feats = jax.jit(lambda v, x: m.apply(v, x))(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    dec = decode_detections(feats, nc=80, strides=m.stride)  # (1, A, 4+nc)
    dec_t = np.asarray(dec).transpose(0, 2, 1)
    np.testing.assert_allclose(dec_t, y_ref, atol=2e-3, rtol=2e-3)


def test_yolov8_legacy_head_parity():
    """C2f backbone + legacy Detect branch vs the torch reference."""
    from oracle import torch_detection_model
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    tm = torch_detection_model("yolov8n.yaml", nc=80, seed=7)
    jm = build_model("yolov8n.yaml", verbose=False)
    v = jm.init(jax.random.PRNGKey(0))
    state = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    conv = torch_state_to_variables(state)
    v = load_state_into_variables(v, conv, strict=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.4
    ref = _torch_raw(tm, x)
    from spectrogram_yolov11_tpu.ops.decode import concat_feats

    ours = concat_feats(jax.jit(lambda v, x: jm.apply(v, x))(v, jnp.asarray(x.transpose(0, 2, 3, 1))))
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2), r, atol=2e-4, rtol=2e-3)
