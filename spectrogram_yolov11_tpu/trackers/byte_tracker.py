"""BYTETracker — two-stage (high/low confidence) IoU association over
Kalman-predicted tracks.

Counterpart of /root/reference/ultralytics/trackers/byte_tracker.py
(STrack:12, BYTETracker:235): same lifecycle (new -> tracked -> lost ->
removed), same thresholds from the tracker yaml, same two-pass BYTE
association with score fusion on the first pass.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .utils import matching
from .utils.kalman_filter import KalmanFilterXYAH


class TrackState:
    New = 0
    Tracked = 1
    Lost = 2
    Removed = 3


class STrack:
    shared_kalman = KalmanFilterXYAH()
    _count = 0

    def __init__(self, xywh: np.ndarray, score: float, cls: int):
        # stored as (x, y, a, h) internally, like the reference
        x, y, w, h = xywh[:4]
        self._tlwh = np.asarray([x - w / 2, y - h / 2, w, h], np.float32)
        self.kalman_filter: Optional[KalmanFilterXYAH] = None
        self.mean, self.covariance = None, None
        self.is_activated = False
        self.score = float(score)
        self.cls = int(cls)
        self.idx = -1
        self.tracklet_len = 0
        self.state = TrackState.New
        self.track_id = 0
        self.frame_id = 0
        self.start_frame = 0

    @staticmethod
    def next_id() -> int:
        STrack._count += 1
        return STrack._count

    @staticmethod
    def reset_id() -> None:
        STrack._count = 0

    # -- geometry ----------------------------------------------------------
    @property
    def tlwh(self) -> np.ndarray:
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()  # xyah
        ret[2] *= ret[3]  # a*h = w
        ret[:2] -= ret[2:] / 2
        return ret

    @property
    def xyxy(self) -> np.ndarray:
        ret = self.tlwh
        return np.concatenate([ret[:2], ret[:2] + ret[2:]])

    @property
    def xywh(self) -> np.ndarray:
        ret = self.tlwh
        return np.concatenate([ret[:2] + ret[2:] / 2, ret[2:]])

    @staticmethod
    def tlwh_to_xyah(tlwh: np.ndarray) -> np.ndarray:
        ret = np.asarray(tlwh, np.float32).copy()
        ret[:2] += ret[2:] / 2
        ret[2] /= ret[3]
        return ret

    # -- lifecycle -----------------------------------------------------------
    def activate(self, kalman_filter, frame_id: int):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self.tlwh_to_xyah(self._tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        if frame_id == 1:
            self.is_activated = True
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track: "STrack", frame_id: int, new_id: bool = False):
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xyah(new_track.tlwh)
        )
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def update(self, new_track: "STrack", frame_id: int):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xyah(new_track.tlwh)
        )
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def predict(self):
        mean_state = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean_state[7] = 0
        self.mean, self.covariance = self.kalman_filter.predict(mean_state, self.covariance)

    def mark_lost(self):
        self.state = TrackState.Lost

    def mark_removed(self):
        self.state = TrackState.Removed

    @property
    def end_frame(self) -> int:
        return self.frame_id

    @staticmethod
    def multi_predict(stracks: List["STrack"]):
        for st in stracks:
            st.predict()

    def result_row(self) -> list:
        return self.xyxy.tolist() + [self.track_id, self.score, self.cls, self.idx]


class BYTETracker:
    """Two-stage association tracker (reference: byte_tracker.py:235)."""

    def __init__(self, args, frame_rate: int = 30):
        self.tracked_stracks: List[STrack] = []
        self.lost_stracks: List[STrack] = []
        self.removed_stracks: List[STrack] = []
        self.frame_id = 0
        self.args = args
        self.max_time_lost = int(frame_rate / 30.0 * args.track_buffer)
        self.kalman_filter = self.get_kalmanfilter()
        STrack.reset_id()

    def get_kalmanfilter(self):
        return KalmanFilterXYAH()

    def init_track(self, xywhs, scores, clss, img=None) -> List[STrack]:
        return [STrack(x, s, c) for x, s, c in zip(xywhs, scores, clss)]

    def get_dists(self, tracks, detections):
        dists = matching.iou_distance(tracks, detections)
        dists = matching.fuse_score(dists, detections)
        return dists

    def multi_predict(self, tracks):
        STrack.multi_predict(tracks)

    def update(self, scores: np.ndarray, xywhs: np.ndarray, clss: np.ndarray, img=None) -> np.ndarray:
        """One frame. Inputs are detection arrays; returns rows
        [x1, y1, x2, y2, track_id, score, cls, det_idx] for activated tracks."""
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []

        for i, d in enumerate(xywhs):
            pass
        remain_inds = scores >= self.args.track_high_thresh
        inds_low = (scores > self.args.track_low_thresh) & (scores < self.args.track_high_thresh)

        dets_high = self.init_track(xywhs[remain_inds], scores[remain_inds], clss[remain_inds], img)
        for j, idx in enumerate(np.where(remain_inds)[0]):
            dets_high[j].idx = int(idx)
        dets_low = self.init_track(xywhs[inds_low], scores[inds_low], clss[inds_low], img)
        for j, idx in enumerate(np.where(inds_low)[0]):
            dets_low[j].idx = int(idx)

        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]
        strack_pool = joint_stracks(tracked, self.lost_stracks)
        self.multi_predict(strack_pool)

        # association 1: high-conf dets vs all tracks
        dists = self.get_dists(strack_pool, dets_high)
        matches, u_track, u_det = matching.linear_assignment(dists, thresh=self.args.match_thresh)
        for it, idet in matches:
            track, det = strack_pool[it], dets_high[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id, new_id=False)
                refind.append(track)

        # association 2: low-conf dets vs remaining tracked
        r_tracked = [strack_pool[i] for i in u_track if strack_pool[i].state == TrackState.Tracked]
        dists = matching.iou_distance(r_tracked, dets_low)
        matches, u_track2, _ = matching.linear_assignment(dists, thresh=0.5)
        for it, idet in matches:
            track, det = r_tracked[it], dets_low[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id, new_id=False)
                refind.append(track)
        for i in u_track2:
            track = r_tracked[i]
            if track.state != TrackState.Lost:
                track.mark_lost()
                lost.append(track)

        # unconfirmed tracks vs remaining high-conf dets
        dets_left = [dets_high[i] for i in u_det]
        dists = self.get_dists(unconfirmed, dets_left)
        matches, u_unconfirmed, u_det2 = matching.linear_assignment(dists, thresh=0.7)
        for it, idet in matches:
            unconfirmed[it].update(dets_left[idet], self.frame_id)
            activated.append(unconfirmed[it])
        for i in u_unconfirmed:
            track = unconfirmed[i]
            track.mark_removed()
            removed.append(track)

        # new tracks
        for i in u_det2:
            det = dets_left[i]
            if det.score >= self.args.new_track_thresh:
                det.activate(self.kalman_filter, self.frame_id)
                activated.append(det)

        # expire lost tracks
        for track in self.lost_stracks:
            if self.frame_id - track.end_frame > self.max_time_lost:
                track.mark_removed()
                removed.append(track)

        self.tracked_stracks = [t for t in self.tracked_stracks if t.state == TrackState.Tracked]
        self.tracked_stracks = joint_stracks(self.tracked_stracks, activated)
        self.tracked_stracks = joint_stracks(self.tracked_stracks, refind)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks.extend(lost)
        self.lost_stracks = sub_stracks(self.lost_stracks, removed)
        self.tracked_stracks, self.lost_stracks = remove_duplicate_stracks(self.tracked_stracks, self.lost_stracks)
        self.removed_stracks.extend(removed)
        if len(self.removed_stracks) > 1000:
            self.removed_stracks = self.removed_stracks[-999:]

        return np.asarray([t.result_row() for t in self.tracked_stracks if t.is_activated], np.float32)

    def reset(self):
        self.tracked_stracks, self.lost_stracks, self.removed_stracks = [], [], []
        self.frame_id = 0
        self.kalman_filter = self.get_kalmanfilter()
        STrack.reset_id()


def joint_stracks(a: List[STrack], b: List[STrack]) -> List[STrack]:
    seen = {t.track_id for t in a}
    return a + [t for t in b if t.track_id not in seen]


def sub_stracks(a: List[STrack], b: List[STrack]) -> List[STrack]:
    ids_b = {t.track_id for t in b}
    return [t for t in a if t.track_id not in ids_b]


def remove_duplicate_stracks(a: List[STrack], b: List[STrack]):
    pdist = matching.iou_distance(a, b)
    pairs = np.where(pdist < 0.15)
    dup_a, dup_b = [], []
    for ia, ib in zip(*pairs):
        time_a = a[ia].frame_id - a[ia].start_frame
        time_b = b[ib].frame_id - b[ib].start_frame
        if time_a > time_b:
            dup_b.append(ib)
        else:
            dup_a.append(ia)
    return [t for i, t in enumerate(a) if i not in dup_a], [t for i, t in enumerate(b) if i not in dup_b]
