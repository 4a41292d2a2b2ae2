"""BoT-SORT: BYTE + camera-motion compensation + optional ReID embeddings.

Counterpart of /root/reference/ultralytics/trackers/bot_sort.py (BOTrack:14,
BOTSORT:147) and utils/gmc.py:11 (sparse-optical-flow GMC variant).
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional

import cv2
import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState
from .utils import matching
from .utils.kalman_filter import KalmanFilterXYWH


class GMC:
    """Global motion compensation (reference: trackers/utils/gmc.py:11).

    All four reference methods: 'sparseOptFlow' (default), 'orb', 'sift'
    (feature match + RANSAC affine), and 'ecc' (intensity-based
    findTransformECC), plus 'none'.
    """

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts: Optional[np.ndarray] = None
        self.prev_kps = None
        self.prev_desc = None
        if method == "orb":
            self.detector = cv2.FastFeatureDetector_create(20)
            self.extractor = cv2.ORB_create()
            self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        elif method == "sift":
            self.detector = cv2.SIFT_create(nOctaveLayers=3, contrastThreshold=0.02, edgeThreshold=20)
            self.extractor = self.detector
            self.matcher = cv2.BFMatcher(cv2.NORM_L2)
        elif method not in {"sparseOptFlow", "ecc", "none", None}:
            raise ValueError(f"unknown GMC method '{method}' (want orb|sift|ecc|sparseOptFlow|none)")

    def apply(self, frame: np.ndarray, dets=None) -> np.ndarray:
        if self.method in {"none", None} or frame is None:
            return np.eye(2, 3)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        if self.method == "ecc":
            return self._apply_ecc(gray)
        if self.method in {"orb", "sift"}:
            return self._apply_features(gray)
        return self._apply_sparseflow(gray)

    def _scale_translation(self, H: np.ndarray) -> np.ndarray:
        if self.downscale > 1:
            H = H.copy()
            H[0, 2] *= self.downscale
            H[1, 2] *= self.downscale
        return H

    def _apply_sparseflow(self, gray: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3)
        pts = cv2.goodFeaturesToTrack(gray, maxCorners=200, qualityLevel=0.01, minDistance=10)
        if self.prev_gray is not None and self.prev_pts is not None and len(self.prev_pts) >= 4:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
            if nxt is not None:
                good_prev = self.prev_pts[status.flatten() == 1]
                good_next = nxt[status.flatten() == 1]
                if len(good_prev) >= 4:
                    M, _ = cv2.estimateAffinePartial2D(good_prev, good_next, method=cv2.RANSAC)
                    if M is not None:
                        H = self._scale_translation(M)
        self.prev_gray = gray
        self.prev_pts = pts
        return H

    def _apply_ecc(self, gray: np.ndarray) -> np.ndarray:
        """Intensity-based ECC alignment (reference gmc.py applyEcc)."""
        H = np.eye(2, 3, dtype=np.float32)
        if self.prev_gray is not None:
            criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-5)
            try:
                _, M = cv2.findTransformECC(self.prev_gray, gray, H, cv2.MOTION_EUCLIDEAN, criteria, None, 1)
                H = self._scale_translation(M)
            except cv2.error:
                pass  # ECC failed to converge — identity (reference warns and continues)
        self.prev_gray = gray
        return np.asarray(H, np.float64)

    def _apply_features(self, gray: np.ndarray) -> np.ndarray:
        """ORB/SIFT keypoint matching + RANSAC (reference gmc.py applyFeatures)."""
        H = np.eye(2, 3)
        kps = self.detector.detect(gray, None)
        kps, desc = self.extractor.compute(gray, kps)
        if (self.prev_gray is not None and self.prev_desc is not None and desc is not None
                and len(self.prev_desc) >= 2 and len(desc) >= 2):
            knn = self.matcher.knnMatch(self.prev_desc, desc, k=2)
            good = [m for m, n in (p for p in knn if len(p) == 2) if m.distance < 0.75 * n.distance]
            if len(good) >= 4:
                prev_pts = np.float32([self.prev_kps[m.queryIdx].pt for m in good])
                curr_pts = np.float32([kps[m.trainIdx].pt for m in good])
                M, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, method=cv2.RANSAC)
                if M is not None:
                    H = self._scale_translation(M)
        self.prev_gray = gray
        self.prev_kps, self.prev_desc = kps, desc
        return H

    def reset_params(self):
        self.prev_gray = None
        self.prev_pts = None
        self.prev_kps = None
        self.prev_desc = None


class BOTrack(STrack):
    """STrack with XYWH Kalman state and exponentially-smoothed ReID features."""

    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xywh, score, cls, feat: Optional[np.ndarray] = None, feat_history: int = 50):
        super().__init__(xywh, score, cls)
        self.smooth_feat: Optional[np.ndarray] = None
        self.curr_feat: Optional[np.ndarray] = None
        self.features: deque = deque([], maxlen=feat_history)
        self.alpha = 0.9
        if feat is not None:
            self.update_features(feat)

    def update_features(self, feat: np.ndarray):
        feat = feat / (np.linalg.norm(feat) + 1e-9)
        self.curr_feat = feat
        self.smooth_feat = feat if self.smooth_feat is None else self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        self.features.append(feat)
        self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-9

    # XYWH state instead of XYAH
    @property
    def tlwh(self) -> np.ndarray:
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()  # xywh
        ret[:2] -= ret[2:] / 2
        return ret

    @staticmethod
    def tlwh_to_xywh(tlwh: np.ndarray) -> np.ndarray:
        ret = np.asarray(tlwh, np.float32).copy()
        ret[:2] += ret[2:] / 2
        return ret

    def activate(self, kalman_filter, frame_id: int):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self.tlwh_to_xywh(self._tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        if frame_id == 1:
            self.is_activated = True
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        if getattr(new_track, "curr_feat", None) is not None:
            self.update_features(new_track.curr_feat)
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xywh(new_track.tlwh)
        )
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score, self.cls, self.idx = new_track.score, new_track.cls, new_track.idx

    def update(self, new_track, frame_id):
        if getattr(new_track, "curr_feat", None) is not None:
            self.update_features(new_track.curr_feat)
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xywh(new_track.tlwh)
        )
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score, self.cls, self.idx = new_track.score, new_track.cls, new_track.idx

    @staticmethod
    def multi_gmc(stracks: List["BOTrack"], H: np.ndarray):
        if not len(stracks):
            return
        R = H[:2, :2]
        t = H[:2, 2]
        R8 = np.kron(np.eye(4), R)
        for st in stracks:
            if st.mean is None:
                continue
            mean = R8 @ st.mean
            mean[:2] += t
            st.mean = mean
            st.covariance = R8 @ st.covariance @ R8.T


class BOTSORT(BYTETracker):
    """BYTE + GMC (+ appearance cost when with_reid) (reference: bot_sort.py:147)."""

    def __init__(self, args, frame_rate: int = 30):
        super().__init__(args, frame_rate)
        self.proximity_thresh = args.proximity_thresh
        self.appearance_thresh = args.appearance_thresh
        self.with_reid = bool(getattr(args, "with_reid", False))
        self.encoder = None  # ReID model hook (optional)
        self.gmc = GMC(method=getattr(args, "gmc_method", "sparseOptFlow"))

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def init_track(self, xywhs, scores, clss, img=None):
        if len(xywhs) == 0:
            return []
        feats = self.encoder(img, xywhs) if (self.with_reid and self.encoder is not None) else [None] * len(xywhs)
        return [BOTrack(x, s, c, f) for x, s, c, f in zip(xywhs, scores, clss, feats)]

    def get_dists(self, tracks, detections):
        dists = matching.iou_distance(tracks, detections)
        dists_mask = dists > (1 - self.proximity_thresh)
        dists = matching.fuse_score(dists, detections)
        if self.with_reid and self.encoder is not None and tracks and detections:
            emb = matching.embedding_distance(tracks, detections) / 2.0
            emb[emb > self.appearance_thresh] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    def multi_predict(self, tracks):
        BOTrack.multi_predict(tracks)

    def update(self, scores, xywhs, clss, img=None):
        if img is not None:
            H = self.gmc.apply(img)
            BOTrack.multi_gmc(self.tracked_stracks, H)
            BOTrack.multi_gmc(self.lost_stracks, H)
        return super().update(scores, xywhs, clss, img)

    def reset(self):
        super().reset()
        self.gmc.reset_params()
