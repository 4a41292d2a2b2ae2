"""Results containers (numpy, device-agnostic).

Counterpart of the reference result objects
(/root/reference/ultralytics/engine/results.py: Results:187, Boxes:1015,
Masks:1233, Keypoints:1331, Probs:1455, OBB:1596) over plain numpy — results
have already left the device by construction time (the fixed-shape NMS output
is sliced to n_valid on host).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from spectrogram_yolov11_tpu.ops.boxes import xyxy2xywh
from spectrogram_yolov11_tpu.utils import SimpleClass


class _TensorCompat:
    """Device-movement surface of the reference BaseTensor
    (engine/results.py:22: cpu/numpy/cuda/to/shape). Our containers are plain
    numpy — already off-device — so movement is the identity; the methods
    exist so reference call sites (`r.boxes.cpu().numpy()`) run unchanged."""

    def cpu(self):
        return self

    def numpy(self):
        return self

    def cuda(self):  # no CUDA here; kept for drop-in source compat
        return self

    def to(self, *args, **kwargs):
        return self

    @property
    def shape(self):
        return self.data.shape


class Boxes(_TensorCompat, SimpleClass):
    """(n, 6) [x1, y1, x2, y2, conf, cls] in original-image pixels.

    `id` carries per-box track ids after `model.track()` (None otherwise) —
    same surface as the reference's Boxes.id (engine/results.py:1015)."""

    def __init__(self, data: np.ndarray, orig_shape, ids: np.ndarray | None = None):
        self.data = np.asarray(data, np.float32).reshape(-1, 6)
        self.orig_shape = orig_shape
        self.id = None if ids is None else np.asarray(ids)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Boxes(self.data[i], self.orig_shape, None if self.id is None else np.atleast_1d(self.id[i]))

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        return xyxy2xywh(self.data[:, :4])

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.data[:, :4] / np.asarray([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h], np.float32)


class Masks(_TensorCompat, SimpleClass):
    """(n, H, W) binary masks at original-image resolution."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self) -> List[np.ndarray]:
        """Mask contours in pixel coords."""
        out = []
        for m in self.data.astype(np.uint8):
            cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32) if cs else np.zeros((0, 2), np.float32))
        return out


class Keypoints(_TensorCompat, SimpleClass):
    """(n, K, 2|3) keypoints in original-image pixels."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32)
        self.orig_shape = orig_shape

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.data[..., :2] / np.asarray([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs(_TensorCompat, SimpleClass):
    """Classification probabilities (nc,)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top5(self) -> List[int]:
        return self.data.argsort()[::-1][:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(self.data.max())

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBBoxes(_TensorCompat, SimpleClass):
    """(n, 7) [cx, cy, w, h, angle, conf, cls] rotated boxes."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 7)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        from spectrogram_yolov11_tpu.ops.tal import rbox2corners
        import jax.numpy as jnp

        return np.asarray(rbox2corners(jnp.asarray(self.data[:, :5])))

    @property
    def xyxyxyxyn(self):
        h, w = self.orig_shape
        return self.xyxyxyxy / np.asarray([w, h], np.float32)

    @property
    def xyxy(self):
        """Axis-aligned hull of each rotated box (reference OBB.xyxy:1713)."""
        c = self.xyxyxyxy.reshape(-1, 4, 2)
        return np.concatenate([c.min(axis=1), c.max(axis=1)], axis=-1)


_COLORS = np.array(
    [[4, 42, 255], [11, 219, 235], [243, 243, 243], [0, 223, 183], [17, 31, 104], [255, 111, 221],
     [255, 68, 79], [204, 237, 0], [0, 243, 68], [189, 0, 255], [0, 180, 255], [221, 0, 186],
     [0, 192, 38], [255, 36, 125], [104, 0, 123], [108, 27, 255], [47, 109, 252], [104, 31, 17]],
    np.uint8,
)


class Results(SimpleClass):
    """One image's predictions + plotting/serialization."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str,
        names: Dict[int, str],
        boxes: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        probs: Optional[np.ndarray] = None,
        keypoints: Optional[np.ndarray] = None,
        obb: Optional[np.ndarray] = None,
        speed: Optional[dict] = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBBoxes(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {"preprocess": None, "inference": None, "postprocess": None}

    def __len__(self):
        for k in (self.boxes, self.masks, self.obb):
            if k is not None:
                return len(k)
        return 0

    def __getitem__(self, i):
        """Row-select detections (reference Results.__getitem__): i may be an
        int, slice, or boolean/index array over the detection axis."""
        return Results(
            self.orig_img, self.path, self.names,
            boxes=self.boxes.data[i].reshape(-1, self.boxes.data.shape[-1]) if self.boxes is not None else None,
            masks=self.masks.data[i].reshape((-1,) + self.masks.data.shape[1:]) if self.masks is not None else None,
            probs=self.probs.data if self.probs is not None else None,
            keypoints=self.keypoints.data[i].reshape((-1,) + self.keypoints.data.shape[1:]) if self.keypoints is not None else None,
            obb=self.obb.data[i].reshape(-1, self.obb.data.shape[-1]) if self.obb is not None else None,
            speed=self.speed,
        )

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5, show_conf: bool = True,
             show_labels: bool = True, img: Optional[np.ndarray] = None) -> np.ndarray:
        """Draw detections on a copy of the original (BGR) image, or on `img`
        (reference: engine/results.py Results.plot(img=...))."""
        img = self.orig_img.copy() if img is None else img
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        if self.masks is not None:
            overlay = img.copy()
            for i, m in enumerate(self.masks.data):
                color = _COLORS[i % len(_COLORS)].tolist()
                overlay[m.astype(bool)] = color
            img = cv2.addWeighted(img, 0.55, overlay, 0.45, 0)
        if self.boxes is not None:
            for b in self.boxes.data:
                c = int(b[5])
                color = _COLORS[c % len(_COLORS)].tolist()
                p1, p2 = (int(b[0]), int(b[1])), (int(b[2]), int(b[3]))
                cv2.rectangle(img, p1, p2, color, lw)
                if show_labels:
                    label = self.names.get(c, str(c)) + (f" {b[4]:.2f}" if show_conf else "")
                    cv2.putText(img, label, (p1[0], max(p1[1] - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX,
                                font_scale, color, max(lw - 1, 1))
        if self.keypoints is not None:
            for kp in self.keypoints.data:
                for x, y, *v in kp:
                    if not v or v[0] > 0.5:
                        cv2.circle(img, (int(x), int(y)), max(lw, 2), (0, 255, 0), -1)
        if self.obb is not None:
            for i, corners in enumerate(self.obb.xyxyxyxy):
                c = int(self.obb.cls[i])
                cv2.polylines(img, [corners.astype(np.int32)], True, _COLORS[c % len(_COLORS)].tolist(), lw)
        return img

    def save(self, filename: str | Path, **plot_kw) -> str:
        cv2.imwrite(str(filename), self.plot(**plot_kw))
        return str(filename)

    def save_crop(self, save_dir: str | Path, file_name: str | Path = "im.jpg") -> None:
        """Save each detection crop to save_dir/<class_name>/<file_name>
        (reference results.py save_crop; square-expanded crops with a small
        margin, like the reference's save_one_box gain/pad)."""
        if self.boxes is None or not len(self.boxes.data):
            return
        h, w = self.orig_img.shape[:2]
        for i, b in enumerate(self.boxes.data):
            cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
            bw, bh = (b[2] - b[0]) * 1.02 + 10, (b[3] - b[1]) * 1.02 + 10
            x1, x2 = int(max(cx - bw / 2, 0)), int(min(cx + bw / 2, w))
            y1, y2 = int(max(cy - bh / 2, 0)), int(min(cy + bh / 2, h))
            if x2 <= x1 or y2 <= y1:
                continue
            d = Path(save_dir) / self.names.get(int(b[5]), str(int(b[5])))
            d.mkdir(parents=True, exist_ok=True)
            stem, suffix = Path(file_name).stem, Path(file_name).suffix or ".jpg"
            cv2.imwrite(str(d / f"{stem}{'' if i == 0 else f'_{i}'}{suffix}"), self.orig_img[y1:y2, x1:x2])

    def save_txt(self, txt_file: str | Path, save_conf: bool = False) -> None:
        """YOLO-format label rows (reference results.py save_txt): seg results
        write normalized polygons, pose results append normalized keypoints."""
        h, w = self.orig_img.shape[:2]
        lines = []
        if self.boxes is not None:
            for i, (b, xywhn) in enumerate(zip(self.boxes.data, self.boxes.xywhn)):
                if self.masks is not None and i < len(self.masks.data):
                    from spectrogram_yolov11_tpu.data.converter import masks2segments

                    (seg,) = masks2segments(self.masks.data[i : i + 1])
                    coords = (seg / np.asarray([w, h], np.float32)).reshape(-1) if len(seg) else []
                    line = (int(b[5]), *(float(v) for v in coords))
                else:
                    line = (int(b[5]), *xywhn.tolist())
                if self.keypoints is not None and i < len(self.keypoints.data):
                    kp = np.asarray(self.keypoints.data[i], np.float32).copy()
                    kp[..., 0] /= w
                    kp[..., 1] /= h
                    line = line + tuple(float(v) for v in kp.reshape(-1))
                if save_conf:
                    line = line + (float(b[4]),)
                lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in line))
        if self.obb is not None:
            for i, corners in enumerate(self.obb.xyxyxyxy):
                c = (np.asarray(corners, np.float32) / np.asarray([w, h], np.float32)).reshape(-1)
                line = (int(self.obb.cls[i]), *(float(v) for v in c))
                if save_conf:
                    line = line + (float(self.obb.conf[i]),)
                lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in line))
        if self.probs is not None:
            lines = [f"{self.probs.top1conf:.2f} {self.names.get(self.probs.top1, self.probs.top1)}"]
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))

    def to_json(self) -> str:
        out = []
        if self.boxes is not None:
            for b in self.boxes.data:
                out.append(
                    {
                        "name": self.names.get(int(b[5]), str(int(b[5]))),
                        "class": int(b[5]),
                        "confidence": round(float(b[4]), 5),
                        "box": {"x1": float(b[0]), "y1": float(b[1]), "x2": float(b[2]), "y2": float(b[3])},
                    }
                )
        if self.probs is not None:
            out.append({"name": self.names.get(self.probs.top1, str(self.probs.top1)), "class": self.probs.top1,
                        "confidence": round(self.probs.top1conf, 5)})
        return json.dumps(out, indent=2)

    def to_df(self):
        """Pandas DataFrame of detections (pandas is optional)."""
        import pandas as pd

        return pd.DataFrame(json.loads(self.to_json()))

    def to_csv(self, *args, **kwargs) -> str:
        """Detections as CSV (reference results.py:851)."""
        return self.to_df().to_csv(*args, **kwargs)

    def to_xml(self, *args, **kwargs) -> str:
        """Detections as XML (reference results.py:878; needs lxml via pandas)."""
        df = self.to_df()
        return df.to_xml(*args, **kwargs) if len(df) else "<?xml version='1.0' encoding='utf-8'?>\n<data></data>"

    def to_sql(self, table_name: str = "results", db_path: str = "results.db") -> None:
        """Append detections to a sqlite table (reference results.py:945)."""
        import sqlite3

        con = sqlite3.connect(db_path)
        try:
            cur = con.cursor()
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {table_name} "
                "(name TEXT, class INTEGER, confidence REAL, x1 REAL, y1 REAL, x2 REAL, y2 REAL)")
            rows = [(r["name"], r["class"], r["confidence"],
                     r.get("box", {}).get("x1"), r.get("box", {}).get("y1"),
                     r.get("box", {}).get("x2"), r.get("box", {}).get("y2"))
                    for r in self.summary()]
            cur.executemany(f"INSERT INTO {table_name} VALUES (?,?,?,?,?,?,?)", rows)
            con.commit()
        finally:
            con.close()

    def tojson(self, *args, **kwargs) -> str:
        """Reference-name alias of to_json (engine/results.py:923)."""
        return self.to_json()

    def cpu(self):
        return self

    def numpy(self):
        return self

    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self

    def summary(self) -> list:
        return json.loads(self.to_json())

    def new(self) -> "Results":
        """Empty Results carrying the same image/path/names (reference
        results.py:444) — the container trackers/update flows start from."""
        return Results(self.orig_img, self.path, self.names, speed=self.speed)

    def update(self, boxes: Optional[np.ndarray] = None, masks: Optional[np.ndarray] = None,
               probs: Optional[np.ndarray] = None, obb: Optional[np.ndarray] = None,
               keypoints: Optional[np.ndarray] = None) -> None:
        """Replace detection tensors in place (reference results.py:416 —
        the tracker uses this to write back track-filtered boxes)."""
        if boxes is not None:
            self.boxes = Boxes(np.asarray(boxes)[:, :6], self.orig_shape,
                               ids=np.asarray(boxes)[:, 6] if np.asarray(boxes).shape[1] > 6 else None)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = Probs(probs)
        if obb is not None:
            self.obb = OBBoxes(obb, self.orig_shape)
        if keypoints is not None:
            self.keypoints = Keypoints(keypoints, self.orig_shape)

    def verbose(self) -> str:
        """Log-line summary — '2 LTEs, 1 RF, ' (reference results.py:488)."""
        if self.probs is not None:
            return ", ".join(f"{self.names.get(i, i)} {self.probs.data[i]:.2f}" for i in self.probs.top5) + ", "
        det = self.obb if self.obb is not None else self.boxes
        if det is None or len(det) == 0:
            return "(no detections), "
        parts = []
        for c in np.unique(det.cls.astype(int)):
            n = int((det.cls.astype(int) == c).sum())
            name = self.names.get(int(c), int(c))
            parts.append(f"{n} {name}{'s' * (n > 1)}")
        return ", ".join(parts) + ", "

    def show(self, *args, **kwargs) -> None:
        """Display the annotated image (reference results.py:455); needs a
        GUI-capable OpenCV — headless builds raise cv2.error, surfaced as-is."""
        cv2.imshow(str(Path(self.path).name), self.plot(*args, **kwargs))
        cv2.waitKey(0)
