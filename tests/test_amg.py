"""AMG (segment-everything) helper parity vs the reference + generate smoke.

Reference: models/sam/amg.py, predict.py:297 Predictor.generate.
"""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.models import amg

torch = pytest.importorskip("torch")


def _load_ref():
    from oracle import load_reference

    load_reference()


def test_point_grids_and_crops_parity():
    _load_ref()
    from ultralytics.models.sam import amg as ref

    np.testing.assert_allclose(amg.build_point_grid(7), ref.build_point_grid(7))
    for g_ours, g_ref in zip(amg.build_all_layer_point_grids(16, 2, 2),
                             ref.build_all_layer_point_grids(16, 2, 2)):
        np.testing.assert_allclose(g_ours, g_ref)
    boxes, layers = amg.generate_crop_boxes((300, 500), 2, 512 / 1500)
    rboxes, rlayers = ref.generate_crop_boxes((300, 500), 2, 512 / 1500)
    assert boxes == [list(b) for b in rboxes] and layers == list(rlayers)


def test_mask_helpers_parity():
    _load_ref()
    from ultralytics.models.sam import amg as ref

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (6, 24, 24)).astype(np.float32)
    ours = amg.calculate_stability_score(logits, 0.0, 0.95)
    theirs = ref.calculate_stability_score(torch.from_numpy(logits), 0.0, 0.95).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

    masks = logits > 0.5
    masks[0] = False  # empty-mask path
    ours_b = amg.batched_mask_to_box(masks)
    theirs_b = ref.batched_mask_to_box(torch.from_numpy(masks)).numpy()
    np.testing.assert_allclose(ours_b, theirs_b)

    boxes = np.array([[0.0, 5, 30, 40], [100, 100, 180, 190], [5, 4, 198, 60]], np.float32)
    ours_e = amg.is_box_near_crop_edge(boxes, [0, 0, 200, 200], [0, 0, 500, 500])
    theirs_e = ref.is_box_near_crop_edge(torch.from_numpy(boxes), [0, 0, 200, 200], [0, 0, 500, 500]).numpy()
    np.testing.assert_array_equal(ours_e, theirs_e)


def test_remove_small_regions_parity():
    _load_ref()
    from ultralytics.models.sam import amg as ref

    m = np.zeros((40, 40), bool)
    m[5:30, 5:30] = True
    m[10:12, 10:12] = False  # small hole
    m[35:37, 35:37] = True  # small island
    for mode in ("holes", "islands"):
        ours, changed_o = amg.remove_small_regions(m.copy(), 16, mode)
        theirs, changed_t = ref.remove_small_regions(m.copy(), 16, mode)
        assert changed_o == changed_t
        np.testing.assert_array_equal(ours, theirs)


@pytest.mark.slow
def test_generate_smoke():
    """Grid-prompted segment-everything over a 2-blob image: fixed-shape prompt
    batches, host-side filtering, NMS dedup (reference predict.py:297)."""
    import cv2

    from spectrogram_yolov11_tpu.models.sam import SAMPredictor

    img = np.full((100, 100, 3), 40, np.uint8)
    cv2.circle(img, (30, 30), 14, (230, 230, 230), -1)
    cv2.rectangle(img, (60, 55), (90, 90), (180, 200, 220), -1)

    p = SAMPredictor(img_size=128)
    masks, scores, boxes = p.generate(
        img, points_stride=4, points_batch_size=8, conf_thres=0.0, stability_score_thresh=0.0)
    assert masks.ndim == 3 and masks.shape[1:] == (128, 128)
    assert len(masks) == len(scores) == len(boxes)
    assert len(masks) >= 1  # with zero thresholds NMS keeps at least one
    assert np.isfinite(scores).all()
