"""mAP engine parity vs the reference implementation."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.ops.metrics import (
    ConfusionMatrix,
    DetMetrics,
    ap_per_class,
    box_iou_np,
    compute_ap,
    match_predictions,
)

torch = pytest.importorskip("torch")


def _synth_eval(rng, n_pred=200, n_gt=80, nc=5):
    tp = rng.uniform(0, 1, (n_pred, 10))
    thr = np.linspace(0.3, 0.8, 10)
    tp = tp > thr  # monotone-ish TP matrix
    tp = np.sort(tp, axis=1)[:, ::-1]
    conf = rng.uniform(0.01, 1, n_pred)
    pred_cls = rng.integers(0, nc, n_pred)
    target_cls = rng.integers(0, nc, n_gt)
    return tp.astype(bool), conf, pred_cls, target_cls


def test_ap_per_class_parity():
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.metrics import ap_per_class as ref_ap

    rng = np.random.default_rng(0)
    tp, conf, pred_cls, target_cls = _synth_eval(rng)
    ref = ref_ap(tp, conf, pred_cls, target_cls, plot=False)
    # reference returns tuple: tp, fp, p, r, f1, ap, unique_classes, p_curve, r_curve, f1_curve, x, prec_values
    ours = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_allclose(ours["ap"], ref[5], atol=1e-10)
    np.testing.assert_allclose(ours["p"], ref[2], atol=1e-10)
    np.testing.assert_allclose(ours["r"], ref[3], atol=1e-10)
    np.testing.assert_array_equal(ours["unique_classes"], ref[6])


def test_match_predictions_parity():
    from types import SimpleNamespace

    from oracle import load_reference

    load_reference()
    from ultralytics.engine.validator import BaseValidator

    rng = np.random.default_rng(1)
    n_pred, n_gt, nc = 60, 20, 4
    pred_cls = rng.integers(0, nc, n_pred)
    true_cls = rng.integers(0, nc, n_gt)
    gt = rng.uniform(0, 200, (n_gt, 2))
    gt = np.concatenate([gt, gt + rng.uniform(10, 60, (n_gt, 2))], -1).astype(np.float32)
    pr = gt[rng.integers(0, n_gt, n_pred)] + rng.normal(0, 8, (n_pred, 4)).astype(np.float32)
    iou = box_iou_np(gt, pr)
    iouv = np.linspace(0.5, 0.95, 10)

    stub = SimpleNamespace(iouv=torch.from_numpy(iouv))
    ref = BaseValidator.match_predictions(
        stub, torch.from_numpy(pred_cls), torch.from_numpy(true_cls), torch.from_numpy(iou)
    ).numpy()
    ours = match_predictions(pred_cls, true_cls, iou, iouv)
    # greedy tie-breaking can differ when two pairs share an identical IoU;
    # require exact match here (random floats -> no ties)
    np.testing.assert_array_equal(ours, ref)


def test_perfect_predictions_give_map_1():
    rng = np.random.default_rng(2)
    n, nc = 50, 3
    cls = rng.integers(0, nc, n)
    tp = np.ones((n, 10), bool)
    m = DetMetrics(names={i: str(i) for i in range(nc)})
    m.process(tp, np.linspace(0.99, 0.5, n), cls, cls)
    # the COCO-style precision sentinel at recall==1 caps AP just below 1.0
    # (the reference behaves identically)
    assert m.box.map > 0.98
    assert m.fitness > 0.98


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(nc=2, conf=0.25)
    gt = np.array([[0, 0, 50, 50], [100, 100, 160, 160]], np.float32)
    gt_cls = np.array([0, 1])
    det = np.array(
        [[2, 2, 52, 52, 0.9, 0], [100, 100, 158, 158, 0.8, 0], [300, 300, 350, 350, 0.7, 1]], np.float32
    )
    cm.process_batch(det, gt, gt_cls)
    assert cm.matrix[0, 0] == 1  # correct class 0
    assert cm.matrix[0, 1] == 1  # class 1 GT detected as class 0
    assert cm.matrix[1, 2] == 1  # spurious class-1 detection -> background FP


def test_val_plots(tmp_path):
    """PR/F1 curves + confusion matrix PNGs materialize from a val run
    (round-1 gap: reduced plotting, reference metrics.py:556, plotting.py:1176)."""
    import numpy as np

    from spectrogram_yolov11_tpu.ops.metrics import ConfusionMatrix, DetMetrics
    from spectrogram_yolov11_tpu.utils.plotting import plot_confusion_matrix, plot_results, plot_val_curves

    rng = np.random.default_rng(0)
    n = 200
    metrics = DetMetrics(names={0: "LTE", 1: "RF"})
    metrics.process(
        rng.random((n, 10)) > 0.5, rng.random(n), rng.integers(0, 2, n), rng.integers(0, 2, 150)
    )
    outs = plot_val_curves(metrics, metrics.names, tmp_path)
    assert len(outs) == 4 and all(p.exists() for p in outs)

    cm = ConfusionMatrix(nc=2)
    det = np.concatenate([rng.uniform(0, 100, (5, 4)), rng.uniform(0.5, 1, (5, 1)), rng.integers(0, 2, (5, 1))], 1)
    cm.process_batch(det, rng.uniform(0, 100, (4, 4)), rng.integers(0, 2, 4))
    assert plot_confusion_matrix(cm.matrix, metrics.names, tmp_path).exists()

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,train/box_loss,metrics/mAP50(B)\n0,1.5,0.2\n1,1.2,0.4\n2,1.0,0.5\n")
    out = plot_results(csv, tmp_path)
    assert out is not None and out.exists()
