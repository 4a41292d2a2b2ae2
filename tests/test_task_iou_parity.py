"""Oracle parity for the per-task validator TP metrics.

The detect val protocol is parity-bounded end-to-end (test_nms_cap.py); this
pins the OTHER tasks' matching metrics against the reference torch
implementations on random data:

- probiou / batch_probiou  (obb val matching; reference utils/metrics.py:298,344)
- kpt_iou (OKS)            (pose val matching; reference utils/metrics.py:256)
- mask_iou                 (segment val matching; reference utils/metrics.py:237)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from spectrogram_yolov11_tpu.ops.iou import batch_probiou, kpt_iou, mask_iou, probiou  # noqa: E402
from spectrogram_yolov11_tpu.ops.metrics import OKS_SIGMA  # noqa: E402


def _ref_metrics():
    from oracle import load_reference

    load_reference()
    from ultralytics.utils import metrics as rm

    return rm


def _rand_obb(rng, n):
    """(n, 5) xywhr with realistic extents and angles in [-pi/2, pi/2)."""
    xy = rng.uniform(50, 590, (n, 2))
    wh = rng.uniform(8, 120, (n, 2))
    r = rng.uniform(-np.pi / 2, np.pi / 2, (n, 1))
    return np.concatenate([xy, wh, r], 1).astype(np.float32)


def test_batch_probiou_parity():
    rm = _ref_metrics()
    rng = np.random.default_rng(0)
    a, b = _rand_obb(rng, 37), _rand_obb(rng, 53)
    ours = np.asarray(batch_probiou(jnp.asarray(a), jnp.asarray(b)))
    ref = rm.batch_probiou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_probiou_elementwise_parity():
    rm = _ref_metrics()
    rng = np.random.default_rng(1)
    a, b = _rand_obb(rng, 64), _rand_obb(rng, 64)
    # overlapping pairs too: b near a
    b[:32] = a[:32] + rng.normal(0, 3, (32, 5)).astype(np.float32)
    b[:, 2:4] = np.maximum(b[:, 2:4], 1.0)
    ours = np.asarray(probiou(jnp.asarray(a), jnp.asarray(b)))
    ref = rm.probiou(torch.from_numpy(a), torch.from_numpy(b)).numpy().reshape(-1)  # ref keeps a trailing dim
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_kpt_iou_oks_parity():
    rm = _ref_metrics()
    rng = np.random.default_rng(2)
    n, m, k = 11, 23, 17
    gt = rng.uniform(0, 640, (n, k, 3)).astype(np.float32)
    gt[..., 2] = rng.integers(0, 3, (n, k))  # visibility 0/1/2
    pred = rng.uniform(0, 640, (m, k, 3)).astype(np.float32)
    # half the preds hover near a GT so OKS isn't all ~0
    pred[: n // 2, :, :2] = gt[: n // 2, :, :2] + rng.normal(0, 5, (n // 2, k, 2)).astype(np.float32)
    area = rng.uniform(500, 30_000, n).astype(np.float32)
    sigma = np.asarray(OKS_SIGMA, np.float32)
    ours = np.asarray(kpt_iou(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(area), sigma))
    ref = rm.kpt_iou(torch.from_numpy(gt), torch.from_numpy(pred), torch.from_numpy(area), sigma.tolist()).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mask_iou_parity():
    rm = _ref_metrics()
    rng = np.random.default_rng(3)
    n, m, hw = 9, 14, 160 * 160
    m1 = (rng.random((n, hw)) > 0.7).astype(np.float32)
    m2 = (rng.random((m, hw)) > 0.7).astype(np.float32)
    m2[:4] = m1[:4]  # identical pairs → IoU 1 on the diagonal block
    ours = np.asarray(mask_iou(jnp.asarray(m1), jnp.asarray(m2)))
    ref = rm.mask_iou(torch.from_numpy(m1), torch.from_numpy(m2)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert (np.diag(ours[:4, :4]) > 0.999).all()
