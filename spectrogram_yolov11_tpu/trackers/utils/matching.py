"""Association cost matrices + linear assignment (numpy/scipy).

Counterpart of /root/reference/ultralytics/trackers/utils/matching.py:
linear_assignment:20 (scipy Hungarian with cost gating), iou_distance:64,
fuse_score:134.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize

from spectrogram_yolov11_tpu.ops.metrics import box_iou_np


def linear_assignment(cost_matrix: np.ndarray, thresh: float):
    """Returns (matches (k,2), unmatched_a, unmatched_b)."""
    if cost_matrix.size == 0:
        return (
            np.empty((0, 2), int),
            tuple(range(cost_matrix.shape[0])),
            tuple(range(cost_matrix.shape[1])),
        )
    row, col = scipy.optimize.linear_sum_assignment(cost_matrix)
    matches = [[r, c] for r, c in zip(row, col) if cost_matrix[r, c] <= thresh]
    matches = np.asarray(matches, int).reshape(-1, 2)
    unmatched_a = tuple(set(range(cost_matrix.shape[0])) - set(matches[:, 0].tolist()))
    unmatched_b = tuple(set(range(cost_matrix.shape[1])) - set(matches[:, 1].tolist()))
    return matches, unmatched_a, unmatched_b


def iou_distance(atracks: list, btracks: list) -> np.ndarray:
    """1 - IoU between track xyxy boxes."""
    a_boxes = np.asarray([t.xyxy for t in atracks], np.float32).reshape(-1, 4)
    b_boxes = np.asarray([t.xyxy for t in btracks], np.float32).reshape(-1, 4)
    if len(a_boxes) == 0 or len(b_boxes) == 0:
        return np.zeros((len(a_boxes), len(b_boxes)), np.float32)
    return 1.0 - box_iou_np(a_boxes, b_boxes)


def embedding_distance(tracks: list, detections: list, metric: str = "cosine") -> np.ndarray:
    """Cosine distance between smoothed track features and detection features."""
    if not tracks or not detections:
        return np.zeros((len(tracks), len(detections)), np.float32)
    det_feats = np.asarray([d.curr_feat for d in detections], np.float32)
    trk_feats = np.asarray([t.smooth_feat for t in tracks], np.float32)
    a = trk_feats / (np.linalg.norm(trk_feats, axis=1, keepdims=True) + 1e-9)
    b = det_feats / (np.linalg.norm(det_feats, axis=1, keepdims=True) + 1e-9)
    return np.maximum(0.0, 1.0 - a @ b.T)


def fuse_score(cost_matrix: np.ndarray, detections: list) -> np.ndarray:
    """Fuse IoU similarity with detection confidence (reference: matching.py:134)."""
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1 - cost_matrix
    det_scores = np.asarray([d.score for d in detections])
    fused = iou_sim * det_scores[None, :]
    return 1 - fused
