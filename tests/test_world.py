"""YOLO-World: module parity vs the torch reference, end-to-end smoke.

Reference: nn/modules/block.py MaxSigmoidAttnBlock:1346, C2fAttn:1381,
ImagePoolingAttn:1408, ContrastiveHead:1454, BNContrastiveHead:1472;
head.py:432 WorldDetect; nn/tasks.py:629 WorldModel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.nn.tasks import build_model
from spectrogram_yolov11_tpu.utils.torch_compat import load_state_into_variables, torch_state_to_variables

torch = pytest.importorskip("torch")

NC = 5


def test_world_forward_parity():
    """Full yolov8s-world graph vs the torch reference with converted weights
    and the same text embeddings."""
    from oracle import load_reference

    load_reference()
    from ultralytics.nn.tasks import WorldModel as TWorldModel

    torch.manual_seed(2)
    tm = TWorldModel("yolov8s-world.yaml", nc=NC, verbose=False)
    tm.eval()
    jm = build_model("yolov8s-world.yaml", nc=NC, verbose=False)
    v = jm.init(jax.random.PRNGKey(0), imgsz=64)
    state = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    v = load_state_into_variables(v, torch_state_to_variables(state), strict=True)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    txt = rng.normal(0, 1, (1, NC, 512)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)

    with torch.no_grad():
        y_t, feats_t = tm.predict(torch.from_numpy(x), txt_feats=torch.from_numpy(txt))
    from spectrogram_yolov11_tpu.ops.decode import concat_feats

    out_j = concat_feats(jm.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False, txt_feats=jnp.asarray(txt)))
    for i, ft in enumerate(feats_t):
        fj = np.asarray(out_j[i]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(fj, ft.numpy(), atol=2e-3)


def test_world_set_classes_and_train_smoke(tmp_path):
    from spectrogram_yolov11_tpu.engine.model import YOLOWorld

    m = YOLOWorld("yolov8s-world.yaml")
    m.set_classes(["triangle", "circle", "square"])
    assert m.model.nc == 3
    r = m.predict(np.zeros((160, 160, 3), np.uint8), imgsz=96)
    assert len(r) == 1

    from spectrogram_yolov11_tpu.engine.trainer import WorldTrainer

    t = WorldTrainer(overrides=dict(
        data="shapes128.yaml", model="yolov8s-world.yaml", imgsz=160, batch=4, nbs=4, epochs=1,
        workers=0, fraction=0.12, val=True, save=False, project=str(tmp_path), name="world",
        exist_ok=True, close_mosaic=0, mosaic=0.0, plots=False,
    ))
    metrics = t.train()
    assert "fitness" in metrics


test_world_set_classes_and_train_smoke = pytest.mark.slow(test_world_set_classes_and_train_smoke)
