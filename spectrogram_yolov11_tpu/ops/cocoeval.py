"""Pure-numpy COCO evaluation protocol (bbox / segm / keypoints).

Faithful re-implementation of pycocotools' COCOeval (the reference runs it at
models/yolo/detect/val.py:285-341 for bbox, segment/val.py:249-282 for
RLE-mask segm, and pose/val.py:136+ for OKS keypoints when save_json=True;
pycocotools is not in this zero-egress image, so the protocol itself is
ported):

- per-(image, category) IoU with crowd semantics — box IoU, RLE mask IoU
  (maskApi.c rleIou), or OKS (computeOks),
- the COCO compressed-RLE codec (maskApi.c rleToString/rleFrString:
  column-major runs, 5-bit groups + continuation bit, delta from the 3rd
  count, ascii offset 48),
- greedy per-threshold matching in score order with ignore regions,
- 101-point precision interpolation accumulated over {iou x recall x cat x
  area x maxDet},
- the standard 12/10-number summary (AP, AP50, AP75, APs/m/l, AR...).

Inputs are plain lists of dicts in COCO json schema: gts need {image_id,
category_id, bbox [x,y,w,h]} (+ optional area, iscrowd, id; segmentation RLE
for segm; keypoints flat [x,y,v]*k for keypoints); dts need the same plus
score.
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


# -- COCO compressed RLE codec (maskApi.c rleToString / rleFrString) ---------

def rle_encode(mask: np.ndarray) -> dict:
    """Binary (h, w) mask -> COCO compressed RLE {size, counts:str}.

    Runs are column-major (Fortran order) and alternate 0s/1s starting with
    0s, exactly like pycocotools' encode (maskApi.c rleEncode + rleToString).
    """
    h, w = mask.shape
    flat = np.asfortranarray(mask, dtype=np.uint8).flatten(order="F")
    # run lengths, first run counts zeros (may be 0-length)
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    cnts = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        cnts = [0] + cnts
    if not flat.size:
        cnts = [0]
    # rleToString: 5-bit groups, bit 0x20 = continuation; counts from index 3
    # onward are deltas vs cnts[i-2]; sign-extension marker is bit 0x10
    out = []
    for i, c in enumerate(cnts):
        x = int(c) - (int(cnts[i - 2]) if i > 2 else 0)
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return {"size": [int(h), int(w)], "counts": "".join(out)}


def _rle_counts(rle: dict) -> np.ndarray:
    """Counts array from either compressed-string or uncompressed-list RLE."""
    counts = rle["counts"]
    if isinstance(counts, (list, tuple, np.ndarray)):
        return np.asarray(counts, dtype=np.int64)
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    cnts: list = []
    p = 0
    while p < len(counts):
        x, k, more = 0, 0, True
        while more:
            c = ord(counts[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return np.asarray(cnts, dtype=np.int64)


def rle_decode(rle: dict) -> np.ndarray:
    """COCO RLE (compressed or uncompressed counts) -> bool (h, w) mask."""
    h, w = rle["size"]
    cnts = _rle_counts(rle)
    vals = np.zeros(len(cnts), dtype=bool)
    vals[1::2] = True
    flat = np.repeat(vals, cnts)
    if flat.size != h * w:
        # a corrupt/truncated RLE must fail loudly, not silently zero the
        # mask and quietly depress segm AP (ADVICE r4)
        raise ValueError(f"RLE decodes to {flat.size} px, expected {h}x{w}={h * w}")
    return flat.reshape((w, h)).T


def rle_area(rle: dict) -> float:
    return float(_rle_counts(rle)[1::2].sum())


def _iou_rle(dts: List[dict], gts: List[dict], iscrowd: np.ndarray) -> np.ndarray:
    """RLE mask IoU matrix (D, G); crowd gt uses union = dt area."""
    if not dts or not gts:
        return np.zeros((len(dts), len(gts)))
    dm = np.stack([rle_decode(d["segmentation"]).ravel() for d in dts])
    gm = np.stack([rle_decode(g["segmentation"]).ravel() for g in gts])
    inter = (dm[:, None, :] & gm[None, :, :]).sum(-1).astype(float)
    da = dm.sum(-1).astype(float)[:, None]
    ga = gm.sum(-1).astype(float)[None, :]
    union = np.where(iscrowd[None].astype(bool), da, da + ga - inter)
    return inter / np.maximum(union, 1e-12)


# COCO 17-keypoint OKS sigmas (pycocotools cocoeval.py kpt_oks_sigmas)
COCO_KPT_SIGMAS = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62,
     0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]) / 10.0


def _iou_oks(dts: List[dict], gts: List[dict], sigmas: np.ndarray) -> np.ndarray:
    """OKS matrix (D, G) — pycocotools computeOks, incl. the invisible-gt
    bbox-repulsion branch."""
    if not dts or not gts:
        return np.zeros((len(dts), len(gts)))
    var = (sigmas * 2.0) ** 2
    k = len(sigmas)
    ious = np.zeros((len(dts), len(gts)))
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], float)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = int((vg > 0).sum())
        bx, by, bw, bh = gt["bbox"]
        x0, x1 = bx - bw, bx + 2 * bw
        y0, y1 = by - bh, by + 2 * bh
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], float)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                z = np.zeros(k)
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx ** 2 + dy ** 2) / var / (gt["area"] + np.spacing(1)) / 2.0
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


class COCOeval:
    """Protocol-faithful COCOeval (bbox/segm/keypoints) over in-memory
    annotation dicts."""

    def __init__(self, gts: List[dict], dts: List[dict],
                 iou_thrs: Sequence[float] = None, rec_thrs: Sequence[float] = None,
                 max_dets: Sequence[int] = None, area_rng: Dict[str, tuple] = None,
                 iou_type: str = "bbox", kpt_sigmas: np.ndarray = None):
        assert iou_type in ("bbox", "segm", "keypoints")
        self.iou_type = iou_type
        self.kpt_sigmas = np.asarray(kpt_sigmas if kpt_sigmas is not None else COCO_KPT_SIGMAS)
        self.iou_thrs = np.asarray(iou_thrs if iou_thrs is not None else np.linspace(0.5, 0.95, 10))
        self.rec_thrs = np.asarray(rec_thrs if rec_thrs is not None else np.linspace(0.0, 1.0, 101))
        if max_dets is None:
            # pycocotools Params: (1, 10, 100) for bbox/segm, (20,) for keypoints
            max_dets = (20,) if iou_type == "keypoints" else (1, 10, 100)
        self.max_dets = sorted(max_dets)
        if area_rng is None:
            area_rng = {
                "all": (0.0, 1e10), "small": (0.0, 32.0 ** 2),
                "medium": (32.0 ** 2, 96.0 ** 2), "large": (96.0 ** 2, 1e10),
            }
            if iou_type == "keypoints":  # kp protocol drops "small"
                area_rng.pop("small")
        self.area_rng = area_rng
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for i, g in enumerate(gts):
            g = dict(g)
            g.setdefault("id", i + 1)
            g.setdefault("iscrowd", 0)
            if iou_type == "segm":
                g.setdefault("area", rle_area(g["segmentation"]))
            else:
                g.setdefault("area", float(g["bbox"][2] * g["bbox"][3]))
            g.setdefault("ignore", g["iscrowd"])
            if iou_type == "keypoints":
                # pycocotools _prepare: gts with no labelled keypoints are ignored
                nk = g.get("num_keypoints")
                if nk is None:
                    nk = int((np.asarray(g["keypoints"], float)[2::3] > 0).sum())
                g["ignore"] = bool(g["ignore"]) or nk == 0
            self._gts[(g["image_id"], g["category_id"])].append(g)
        for d in dts:
            d = dict(d)
            # dt area for the out-of-range ignore (pycocotools loadRes)
            if "area" not in d:
                if iou_type == "segm":
                    d["area"] = rle_area(d["segmentation"])
                elif iou_type == "keypoints":
                    kp = np.asarray(d["keypoints"], float)
                    xs, ys = kp[0::3], kp[1::3]
                    d["area"] = float((xs.max() - xs.min()) * (ys.max() - ys.min())) if kp.size else 0.0
                else:
                    d["area"] = float(d["bbox"][2] * d["bbox"][3])
            self._dts[(d["image_id"], d["category_id"])].append(d)
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
        crowd = np.array([g["iscrowd"] for g in gts], int)
        if self.iou_type == "segm":
            ious = _iou_rle(dts, gts, crowd)
        elif self.iou_type == "keypoints":
            ious = _iou_oks(dts, gts, self.kpt_sigmas)
        else:
            gbb = np.array([g["bbox"] for g in gts], float).reshape(-1, 4)
            dbb = np.array([d["bbox"] for d in dts], float).reshape(-1, 4)
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
        d_areas = np.array([d["area"] for d in dts], float)
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
        areas = [a for a in ("small", "medium", "large") if a in self.area_rng]
        self.stats = {
            "AP": self._summ(True, None, "all", md),
            "AP50": self._summ(True, 0.5, "all", md),
            "AP75": self._summ(True, 0.75, "all", md),
            **{f"AP{a}": self._summ(True, None, a, md) for a in areas},
            **{f"AR{m}": self._summ(False, None, "all", m) for m in self.max_dets},
            **{f"AR{a}": self._summ(False, None, a, md) for a in areas},
        }
