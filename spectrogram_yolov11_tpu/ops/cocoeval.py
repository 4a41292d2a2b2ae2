"""Pure-numpy COCO evaluation protocol (bbox).

Faithful re-implementation of pycocotools' COCOeval bbox path (the reference
runs it at models/yolo/detect/val.py:285-341 when save_json=True and asserts
agreement with its internal mAP; pycocotools is not in this zero-egress
image, so the protocol itself is ported):

- per-(image, category) IoU with crowd semantics,
- greedy per-threshold matching in score order with ignore regions,
- 101-point precision interpolation accumulated over {iou x recall x cat x
  area x maxDet},
- the standard 12-number summary (AP, AP50, AP75, APs/m/l, AR1/10/100, ...).

Inputs are plain lists of dicts in COCO json schema: gts need {image_id,
category_id, bbox [x,y,w,h]} (+ optional area, iscrowd, id); dts need the
same plus score.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np


def _iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """COCO maskUtils.iou for bbox: (D, G); crowd gt uses union=dt area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = np.minimum(dx2[:, None], gx2[None]) - np.maximum(dx1[:, None], gx1[None])
    ih = np.minimum(dy2[:, None], gy2[None]) - np.maximum(dy1[:, None], gy1[None])
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    da = (dt[:, 2] * dt[:, 3])[:, None]
    ga = (gt[:, 2] * gt[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), da, da + ga - inter)
    return inter / np.maximum(union, 1e-12)


class COCOeval:
    """Protocol-faithful bbox COCOeval over in-memory annotation dicts."""

    def __init__(self, gts: List[dict], dts: List[dict],
                 iou_thrs: Sequence[float] = None, rec_thrs: Sequence[float] = None,
                 max_dets: Sequence[int] = (1, 10, 100), area_rng: Dict[str, tuple] = None):
        self.iou_thrs = np.asarray(iou_thrs if iou_thrs is not None else np.linspace(0.5, 0.95, 10))
        self.rec_thrs = np.asarray(rec_thrs if rec_thrs is not None else np.linspace(0.0, 1.0, 101))
        self.max_dets = sorted(max_dets)
        self.area_rng = area_rng or {
            "all": (0.0, 1e10), "small": (0.0, 32.0 ** 2),
            "medium": (32.0 ** 2, 96.0 ** 2), "large": (96.0 ** 2, 1e10),
        }
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for i, g in enumerate(gts):
            g = dict(g)
            g.setdefault("id", i + 1)
            g.setdefault("iscrowd", 0)
            g.setdefault("area", float(g["bbox"][2] * g["bbox"][3]))
            g.setdefault("ignore", g["iscrowd"])
            self._gts[(g["image_id"], g["category_id"])].append(g)
        for d in dts:
            self._dts[(d["image_id"], d["category_id"])].append(dict(d))
        self.img_ids = sorted({k[0] for k in list(self._gts) + list(self._dts)})
        self.cat_ids = sorted({k[1] for k in list(self._gts) + list(self._dts)})
        self.stats: Dict[str, float] = {}

    # -- per-image evaluation (pycocotools evaluateImg) ----------------------
    def _evaluate_img(self, img_id, cat_id, arng, max_det):
        gts = self._gts[(img_id, cat_id)]
        dts = sorted(self._dts[(img_id, cat_id)], key=lambda d: -d["score"])[:max_det]
        if not gts and not dts:
            return None
        g_ignore = np.array(
            [bool(g["ignore"]) or g["area"] < arng[0] or g["area"] > arng[1] for g in gts], bool
        )
        # gts sorted: non-ignored first (pycocotools gtind)
        order = np.argsort(g_ignore, kind="stable")
        gts = [gts[i] for i in order]
        g_ignore = g_ignore[order]
        gbb = np.array([g["bbox"] for g in gts], float).reshape(-1, 4)
        dbb = np.array([d["bbox"] for d in dts], float).reshape(-1, 4)
        crowd = np.array([g["iscrowd"] for g in gts], int)
        ious = _iou_xywh(dbb, gbb, crowd)

        T, D, G = len(self.iou_thrs), len(dts), len(gts)
        dt_m = np.zeros((T, D), int)
        gt_m = np.zeros((T, G), int)
        dt_ig = np.zeros((T, D), bool)
        for ti, t in enumerate(self.iou_thrs):
            for di in range(D):
                best, m = min(t, 1 - 1e-10), -1
                for gi in range(G):
                    if gt_m[ti, gi] and not crowd[gi]:
                        continue  # already matched to a non-crowd gt
                    if m > -1 and not g_ignore[m] and g_ignore[gi]:
                        break  # past non-ignored gts; best match done
                    if ious[di, gi] < best:
                        continue
                    best, m = ious[di, gi], gi
                if m == -1:
                    continue
                dt_ig[ti, di] = g_ignore[m]
                dt_m[ti, di] = gts[m]["id"]
                gt_m[ti, m] = 1
        # unmatched dts outside the area range are ignored too
        d_areas = dbb[:, 2] * dbb[:, 3]
        out_rng = (d_areas < arng[0]) | (d_areas > arng[1])
        dt_ig = dt_ig | ((dt_m == 0) & out_rng[None])
        return {
            "dt_scores": np.array([d["score"] for d in dts], float),
            "dt_matched": dt_m > 0,
            "dt_ignore": dt_ig,
            "n_gt": int((~g_ignore).sum()),
        }

    # -- accumulate (pycocotools accumulate) ---------------------------------
    def evaluate(self) -> "COCOeval":
        T, R = len(self.iou_thrs), len(self.rec_thrs)
        K, A, M = len(self.cat_ids), len(self.area_rng), len(self.max_dets)
        self.precision = -np.ones((T, R, K, A, M))
        self.recall = -np.ones((T, K, A, M))
        for ki, cat in enumerate(self.cat_ids):
            for ai, arng in enumerate(self.area_rng.values()):
                # pycocotools matches once at maxDets[-1] and SLICES the first
                # maxDet per-image columns for the smaller limits
                evs_all = [self._evaluate_img(i, cat, arng, self.max_dets[-1]) for i in self.img_ids]
                evs_all = [e for e in evs_all if e is not None]
                for mi, max_det in enumerate(self.max_dets):
                    evs = evs_all
                    if not evs:
                        continue
                    scores = np.concatenate([e["dt_scores"][:max_det] for e in evs])
                    order = np.argsort(-scores, kind="mergesort")
                    matched = np.concatenate([e["dt_matched"][:, :max_det] for e in evs], 1)[:, order]
                    ignored = np.concatenate([e["dt_ignore"][:, :max_det] for e in evs], 1)[:, order]
                    n_gt = sum(e["n_gt"] for e in evs)
                    if n_gt == 0:
                        continue
                    tps = matched & ~ignored
                    fps = ~matched & ~ignored
                    tp_sum = np.cumsum(tps, 1).astype(float)
                    fp_sum = np.cumsum(fps, 1).astype(float)
                    for ti in range(T):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        self.recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        # precision envelope (monotone non-increasing)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, self.rec_thrs, side="left")
                        q = np.zeros(R)
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        self.precision[ti, :, ki, ai, mi] = q
        self._summarize()
        return self

    def _summ(self, ap=True, iou=None, area="all", max_det=100) -> float:
        ai = list(self.area_rng).index(area)
        mi = self.max_dets.index(max_det)
        if ap:
            s = self.precision[..., ai, mi]
            if iou is not None:
                s = s[np.isclose(self.iou_thrs, iou)]
        else:
            s = self.recall[:, :, ai, mi]
            if iou is not None:
                s = s[np.isclose(self.iou_thrs, iou)]
        s = s[s > -1]
        return float(s.mean()) if s.size else -1.0

    def _summarize(self) -> None:
        md = self.max_dets[-1]
        self.stats = {
            "AP": self._summ(True, None, "all", md),
            "AP50": self._summ(True, 0.5, "all", md),
            "AP75": self._summ(True, 0.75, "all", md),
            "APsmall": self._summ(True, None, "small", md),
            "APmedium": self._summ(True, None, "medium", md),
            "APlarge": self._summ(True, None, "large", md),
            **{f"AR{m}": self._summ(False, None, "all", m) for m in self.max_dets},
            "ARsmall": self._summ(False, None, "small", md),
            "ARmedium": self._summ(False, None, "medium", md),
            "ARlarge": self._summ(False, None, "large", md),
        }
