"""Pallas NMS kernel vs the XLA formulation (interpret mode on CPU; the real
kernel runs on TPU where bench.py exercises it)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectrogram_yolov11_tpu.ops.nms import non_max_suppression
from spectrogram_yolov11_tpu.ops.pallas_nms import non_max_suppression_pallas


def test_pallas_nms_matches_xla():
    rng = np.random.default_rng(9)
    b, a, nc = 2, 256, 6
    cx = rng.uniform(20, 300, (b, a))
    cy = rng.uniform(20, 300, (b, a))
    wh = rng.uniform(8, 80, (b, a, 2))
    scores = rng.uniform(0, 0.02, (b, a, nc))
    for bi in range(b):
        idx = rng.choice(a, 20, replace=False)
        scores[bi, idx, rng.integers(0, nc, 20)] = rng.uniform(0.3, 0.99, 20)
    preds = np.concatenate([np.stack([cx, cy], -1), wh, scores], -1).astype(np.float32)

    out_x, n_x = non_max_suppression(
        jnp.asarray(preds), conf_thres=0.25, iou_thres=0.45, nc=nc, max_det=50, pre_nms_topk=128
    )
    out_p, n_p = non_max_suppression_pallas(
        jnp.asarray(preds), conf_thres=0.25, iou_thres=0.45, nc=nc, max_det=50, pre_nms_topk=128,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(n_x), np.asarray(n_p))
    for bi in range(b):
        n = int(n_x[bi])
        np.testing.assert_allclose(np.asarray(out_x)[bi, :n], np.asarray(out_p)[bi, :n], atol=1e-4)
