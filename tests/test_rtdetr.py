"""RT-DETR parity + smoke tests.

Oracle parity: the torch reference RTDETRDetectionModel (rtdetr-l.yaml) is
built, its weights converted into our flax variables, and the eval forward
compared end-to-end (decoder output boxes + scores). Loss parity compares
rtdetr_loss against the reference RTDETRDetectionLoss on identical inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.nn.tasks import build_model
from spectrogram_yolov11_tpu.utils.torch_compat import load_state_into_variables, torch_state_to_variables

torch = pytest.importorskip("torch")

NC = 8
IMGSZ = 128  # 16x16 + 8x8 + 4x4 = 336 anchors > 300 queries


@pytest.fixture(scope="module")
def models():
    from oracle import load_reference

    load_reference()
    from ultralytics.nn.tasks import RTDETRDetectionModel

    torch.manual_seed(3)
    tm = RTDETRDetectionModel("rtdetr-l.yaml", nc=NC, verbose=False)
    tm.eval()
    jm = build_model("rtdetr-l.yaml", nc=NC, verbose=False)
    assert jm.task == "rtdetr"
    v = jm.init(jax.random.PRNGKey(0), imgsz=64)
    state = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    v = load_state_into_variables(v, torch_state_to_variables(state), strict=True)
    return tm, jm, v


def test_rtdetr_forward_parity(models):
    tm, jm, v = models
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, IMGSZ, IMGSZ)).astype(np.float32)
    with torch.no_grad():
        y_t, _ = tm.predict(torch.from_numpy(x))  # (1, 300, 4+nc)
    y_t = y_t.numpy()
    y_j = np.asarray(jm.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    assert y_j.shape == y_t.shape
    # The 300 queries are a topk selection; torch.topk and lax.top_k break
    # exact ties differently (untrained weights produce tied enc scores at
    # zero-feature borders), so compare as row SETS: each torch query must
    # have a matching jax query.
    a, b = y_j[0], y_t[0]
    d = np.abs(a[:, None, :] - b[None, :, :]).max(-1)  # (300, 300) chebyshev
    nearest = d.min(0)
    assert (nearest < 2e-3).mean() >= 0.99, f"unmatched rows: {(nearest >= 2e-3).sum()}"
    # and element-wise, the overwhelming majority must agree directly
    assert (np.abs(y_j - y_t) < 2e-3).mean() >= 0.98


def test_detr_loss_parity(models):
    """rtdetr_loss (num_dn=0) vs reference RTDETRDetectionLoss on one batch."""
    from ultralytics.models.utils.loss import RTDETRDetectionLoss

    rng = np.random.default_rng(7)
    B, nq, L, G = 2, 60, 4, 12
    dec_b = rng.uniform(0.1, 0.9, (L, B, nq, 4)).astype(np.float32)
    dec_s = rng.normal(0, 1, (L, B, nq, NC)).astype(np.float32)
    n_per = [5, 3]
    cls_pad = np.zeros((B, G), np.int32)
    box_pad = np.zeros((B, G, 4), np.float32)
    mask = np.zeros((B, G), bool)
    flat_cls, flat_box, gt_groups = [], [], []
    for bi, n in enumerate(n_per):
        c = rng.integers(0, NC, n)
        xy = rng.uniform(0.3, 0.7, (n, 2))
        wh = rng.uniform(0.1, 0.3, (n, 2))
        bx = np.concatenate([xy, wh], -1).astype(np.float32)
        cls_pad[bi, :n], box_pad[bi, :n], mask[bi, :n] = c, bx, True
        flat_cls.append(c)
        flat_box.append(bx)
        gt_groups.append(n)

    crit = RTDETRDetectionLoss(nc=NC, use_vfl=True)
    batch_t = {
        "cls": torch.from_numpy(np.concatenate(flat_cls)).long(),
        "bboxes": torch.from_numpy(np.concatenate(flat_box)),
        "gt_groups": gt_groups,
    }
    loss_t = crit((torch.from_numpy(dec_b), torch.from_numpy(dec_s)), batch_t)
    total_t = float(sum(v for v in loss_t.values()).detach())
    items_t = np.array([float(loss_t[k].detach()) for k in ["loss_giou", "loss_class", "loss_bbox"]])

    # ours: layer 0 plays the role of the reference's prepended encoder layer
    from spectrogram_yolov11_tpu.ops.detr_loss import rtdetr_loss

    outputs = {
        "dec_bboxes": jnp.asarray(dec_b[1:]),
        "dec_scores": jnp.asarray(dec_s[1:]),
        "enc_bboxes": jnp.asarray(dec_b[0]),
        "enc_scores": jnp.asarray(dec_s[0]),
    }
    total_j, items_j = rtdetr_loss(outputs, jnp.asarray(cls_pad), jnp.asarray(box_pad), jnp.asarray(mask), nc=NC)
    np.testing.assert_allclose(np.asarray(items_j), items_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(total_j), total_t, rtol=1e-4)


@pytest.mark.slow
def test_rtdetr_train_smoke(tmp_path):
    """1 epoch on shapes128 at small imgsz: finite loss, checkpoint written."""
    from spectrogram_yolov11_tpu.models.rtdetr import RTDETRTrainer

    t = RTDETRTrainer(overrides=dict(
        data="shapes128.yaml", model="rtdetr-l.yaml", imgsz=160, batch=2, nbs=2, epochs=1,
        workers=0, fraction=0.06, val=True, save=True, project=str(tmp_path), name="rtdetr",
        exist_ok=True, close_mosaic=0, mosaic=0.0, plots=False,
    ))
    metrics = t.train()
    assert t.last.exists()
    assert "fitness" in metrics


import pytest as _pytest


@_pytest.mark.parametrize("impl", ["patch", "packed"])
def test_patch_bilinear_sample_matches_naive_zeros_padding(impl):
    """_patch_bilinear_sample == naive 4-tap bilinear with zeros padding,
    including taps far outside the map (grid_sample align_corners=False)."""
    import jax.numpy as jnp

    from spectrogram_yolov11_tpu.nn.modules.transformer import (
        _packed_bilinear_sample,
        _patch_bilinear_sample,
    )

    fn = _patch_bilinear_sample if impl == "patch" else _packed_bilinear_sample

    rng = np.random.default_rng(0)
    N, H, W, c, S = 3, 7, 9, 4, 64
    v = rng.normal(0, 1, (N, H, W, c)).astype(np.float32)
    # mix of interior, border-straddling, and far-out-of-bounds coords
    px = np.concatenate([rng.uniform(-0.6, W - 0.4, (N, S - 16)),
                         rng.uniform(-30, 30, (N, 16))], axis=1).astype(np.float32)
    py = np.concatenate([rng.uniform(-0.6, H - 0.4, (N, S - 16)),
                         rng.uniform(-30, 30, (N, 16))], axis=1).astype(np.float32)

    out = np.asarray(fn(jnp.asarray(v), jnp.asarray(px), jnp.asarray(py)))

    ref = np.zeros((N, S, c), np.float32)
    for n in range(N):
        for s in range(S):
            x0, y0 = int(np.floor(px[n, s])), int(np.floor(py[n, s]))
            for dy in (0, 1):
                for dx in (0, 1):
                    xi, yi = x0 + dx, y0 + dy
                    w = (1 - abs(px[n, s] - xi)) * (1 - abs(py[n, s] - yi))
                    if 0 <= xi < W and 0 <= yi < H:
                        ref[n, s] += w * v[n, yi, xi]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
