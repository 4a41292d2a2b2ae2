"""Bboxes / Instances containers (reference: utils/instance.py:34,185).

API-compatible with the reference so user code written against it ports
directly. Internally the train pipeline keeps its dict-of-arrays samples
(data/augment.py — a documented deviation: list-of-polygon segments avoid
the reference's eager 1000-point resampling on every sample); these
containers are the public joint-transform surface, parity-tested against
the reference in tests/test_instance.py.

Conventions match the reference exactly: formats {'xyxy','xywh','ltwh'},
segments as a dense (N, S, 2) array (use `resample_segments` to densify
polygon lists), keypoints (N, K, 3) with (x, y, visible).
"""

from __future__ import annotations

from numbers import Number
from typing import List, Optional

import numpy as np

from spectrogram_yolov11_tpu.ops.boxes import xywh2xyxy, xyxy2xywh

_FORMATS = ("xyxy", "xywh", "ltwh")


def ltwh2xyxy(x):
    """(left, top, w, h) -> (x1, y1, x2, y2) (reference ops.py ltwh2xyxy)."""
    y = np.array(x, dtype=np.float32, copy=True)
    y[..., 2] = x[..., 2] + x[..., 0]
    y[..., 3] = x[..., 3] + x[..., 1]
    return y


def xyxy2ltwh(x):
    y = np.array(x, dtype=np.float32, copy=True)
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def ltwh2xywh(x):
    y = np.array(x, dtype=np.float32, copy=True)
    y[..., 0] = x[..., 0] + x[..., 2] / 2
    y[..., 1] = x[..., 1] + x[..., 3] / 2
    return y


def xywh2ltwh(x):
    y = np.array(x, dtype=np.float32, copy=True)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    return y


def resample_segments(segments: list, n: int = 1000) -> list:
    """Upsample each (m, 2) polygon to exactly n points by linear
    interpolation over the closed contour (reference ops.py:636; original
    vertices are kept when upsampling, matching the reference's insert)."""
    out = []
    for s in segments:
        s = np.asarray(s, np.float32)
        if len(s) == n:
            out.append(s)
            continue
        closed = np.concatenate([s, s[0:1]], axis=0)
        xp = np.arange(len(closed), dtype=np.float32)
        if len(closed) < n:
            x = np.linspace(0, len(closed) - 1, n - len(closed))
            x = np.insert(x, np.searchsorted(x, xp), xp)
        else:
            x = np.linspace(0, len(closed) - 1, n)
        out.append(np.stack([np.interp(x, xp, closed[:, k]) for k in range(2)], axis=1).astype(np.float32))
    return out


_CONVERT = {
    ("xyxy", "xywh"): xyxy2xywh, ("xyxy", "ltwh"): xyxy2ltwh,
    ("xywh", "xyxy"): xywh2xyxy, ("xywh", "ltwh"): xywh2ltwh,
    ("ltwh", "xyxy"): ltwh2xyxy, ("ltwh", "xywh"): ltwh2xywh,
}


class Bboxes:
    """Format-aware box array (reference instance.py:34). Mutating ops edit in
    place, like the reference."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"Invalid bounding box format: {format}"
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes
        self.format = format

    def convert(self, format: str) -> None:
        assert format in _FORMATS, f"Invalid bounding box format: {format}"
        if format != self.format:
            self.bboxes = np.asarray(_CONVERT[(self.format, format)](self.bboxes))
            self.format = format

    def areas(self) -> np.ndarray:
        if self.format == "xyxy":
            return (self.bboxes[:, 2] - self.bboxes[:, 0]) * (self.bboxes[:, 3] - self.bboxes[:, 1])
        return self.bboxes[:, 2] * self.bboxes[:, 3]  # xywh / ltwh

    def mul(self, scale) -> None:
        if isinstance(scale, Number):
            scale = (scale,) * 4
        self.bboxes = self.bboxes * np.asarray(scale, self.bboxes.dtype)

    def add(self, offset) -> None:
        if isinstance(offset, Number):
            offset = (offset,) * 4
        self.bboxes = self.bboxes + np.asarray(offset, self.bboxes.dtype)

    def __len__(self) -> int:
        return len(self.bboxes)

    def __getitem__(self, index) -> "Bboxes":
        if isinstance(index, int):
            return Bboxes(self.bboxes[index].reshape(1, -1), self.format)
        b = self.bboxes[index]
        assert b.ndim == 2, f"Indexing on Bboxes with {index} failed to return a matrix!"
        return Bboxes(b, self.format)

    @classmethod
    def concatenate(cls, boxes_list: List["Bboxes"], axis: int = 0) -> "Bboxes":
        assert isinstance(boxes_list, (list, tuple))
        if not boxes_list:
            return cls(np.empty((0, 4), np.float32))
        if len(boxes_list) == 1:
            return boxes_list[0]
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis=axis), boxes_list[0].format)


class Instances:
    """Joint (boxes, segments, keypoints) container with coupled geometric
    transforms (reference instance.py:185)."""

    def __init__(self, bboxes, segments=None, keypoints: Optional[np.ndarray] = None,
                 bbox_format: str = "xywh", normalized: bool = True):
        self._bboxes = Bboxes(bboxes, format=bbox_format)
        if segments is None:
            segments = np.zeros((len(self._bboxes), 0, 2), np.float32)
        elif isinstance(segments, list):
            segments = (np.stack(resample_segments(segments), axis=0) if segments
                        else np.zeros((len(self._bboxes), 0, 2), np.float32))
        self.segments = segments
        self.keypoints = keypoints
        self.normalized = normalized

    # -- bbox passthrough ----------------------------------------------------

    @property
    def bboxes(self) -> np.ndarray:
        return self._bboxes.bboxes

    @property
    def bbox_areas(self) -> np.ndarray:
        return self._bboxes.areas()

    def convert_bbox(self, format: str) -> None:
        self._bboxes.convert(format)

    # -- coupled transforms --------------------------------------------------

    def scale(self, scale_w: float, scale_h: float, bbox_only: bool = False) -> None:
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if bbox_only:
            return
        self.segments[..., 0] *= scale_w
        self.segments[..., 1] *= scale_h
        if self.keypoints is not None:
            self.keypoints[..., 0] *= scale_w
            self.keypoints[..., 1] *= scale_h

    def denormalize(self, w: int, h: int) -> None:
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w: int, h: int) -> None:
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw: float, padh: float) -> None:
        assert not self.normalized, "you should add padding with absolute coordinates."
        self._bboxes.add((padw, padh, padw, padh))
        self.segments[..., 0] += padw
        self.segments[..., 1] += padh
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h: float) -> None:
        if self._bboxes.format == "xyxy":
            y1, y2 = self.bboxes[:, 1].copy(), self.bboxes[:, 3].copy()
            self.bboxes[:, 1] = h - y2
            self.bboxes[:, 3] = h - y1
        else:
            self.bboxes[:, 1] = h - self.bboxes[:, 1]
        self.segments[..., 1] = h - self.segments[..., 1]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w: float) -> None:
        if self._bboxes.format == "xyxy":
            x1, x2 = self.bboxes[:, 0].copy(), self.bboxes[:, 2].copy()
            self.bboxes[:, 0] = w - x2
            self.bboxes[:, 2] = w - x1
        else:
            self.bboxes[:, 0] = w - self.bboxes[:, 0]
        self.segments[..., 0] = w - self.segments[..., 0]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w: float, h: float) -> None:
        ori = self._bboxes.format
        self.convert_bbox("xyxy")
        self.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if ori != "xyxy":
            self.convert_bbox(ori)
        self.segments[..., 0] = self.segments[..., 0].clip(0, w)
        self.segments[..., 1] = self.segments[..., 1].clip(0, h)
        if self.keypoints is not None:
            self.keypoints[..., 0] = self.keypoints[..., 0].clip(0, w)
            self.keypoints[..., 1] = self.keypoints[..., 1].clip(0, h)

    def remove_zero_area_boxes(self) -> np.ndarray:
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            if len(self.segments):
                self.segments = self.segments[good]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def update(self, bboxes, segments=None, keypoints=None) -> None:
        self._bboxes = Bboxes(bboxes, format=self._bboxes.format)
        if segments is not None:
            self.segments = segments
        if keypoints is not None:
            self.keypoints = keypoints

    # -- container protocol --------------------------------------------------

    def __len__(self) -> int:
        return len(self._bboxes)

    def __getitem__(self, index) -> "Instances":
        return Instances(
            bboxes=self.bboxes[index] if not isinstance(index, int) else self.bboxes[index].reshape(1, -1),
            segments=self.segments[index] if len(self.segments) else self.segments,
            keypoints=self.keypoints[index] if self.keypoints is not None else None,
            bbox_format=self._bboxes.format,
            normalized=self.normalized,
        )

    @classmethod
    def concatenate(cls, instances_list: List["Instances"], axis: int = 0) -> "Instances":
        assert isinstance(instances_list, (list, tuple))
        if not instances_list:
            return cls(np.empty((0, 4), np.float32))
        if len(instances_list) == 1:
            return instances_list[0]
        first = instances_list[0]
        cat_boxes = np.concatenate([i.bboxes for i in instances_list], axis=axis)
        seg_lens = {i.segments.shape[1] for i in instances_list}
        if len(seg_lens) > 1:  # mixed densities -> resample to the longest
            max_len = max(seg_lens)
            segs = [
                np.stack(resample_segments(list(i.segments), max_len), axis=0) if len(i.segments)
                else np.zeros((0, max_len, 2), np.float32)
                for i in instances_list
            ]
            cat_segments = np.concatenate(segs, axis=axis)
        else:
            cat_segments = np.concatenate([i.segments for i in instances_list], axis=axis)
        cat_keypoints = (np.concatenate([i.keypoints for i in instances_list], axis=axis)
                         if first.keypoints is not None else None)
        return cls(cat_boxes, cat_segments, cat_keypoints, first._bboxes.format, first.normalized)
