"""Synthetic dataset generators (offline-materialized, YOLO format on disk).

The runtime image has zero egress, so the reference's auto-download datasets
(coco8 etc., data/utils.py:301) are replaced by deterministic generators:

- shapes:      random rectangles/circles/triangles on textured noise — the
               coco8-equivalent smoke-train dataset.
- spectrogram: the north-star domain — synthetic IQ captures with LTE-like
               wideband bursts and RF narrowband bursts, rendered through the
               SAME STFT pipeline the device uses (ops/stft.py), labels in
               (time, freq) boxes. Mirrors the fork's Spectrogram.yaml
               classes ['LTE', 'RF'].
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


def maybe_generate(data: dict) -> bool:
    """Materialize a synthetic dataset described by its yaml (key `synthetic`).

    The class schema follows the yaml: `nc`/`names` sets the label space and
    `kpt_shape` the keypoint layout, so every packaged drop-in dataset config
    (coco8.yaml ... lvis.yaml) synthesizes a stand-in with the REAL schema.
    `train` may be a single dir or a list of dirs (reference surface:
    cfg/datasets/yolo_params.yaml, VOC.yaml) — each entry is generated.
    """
    kind = data.get("synthetic")
    if not kind:
        return False
    n_train = int(data.get("n_train", 64))
    n_val = int(data.get("n_val", 16))
    imgsz = int(data.get("gen_imgsz", 640))
    seed = int(data.get("seed", 0))
    val = data["val"][0] if isinstance(data["val"], list) else data["val"]
    if Path(val).exists():
        return True
    LOGGER.info(f"Generating synthetic '{kind}' dataset at {data['path']} ({n_train} train / {n_val} val)...")
    gen = {
        "shapes": _gen_shapes,
        "spectrogram": _gen_spectrogram,
        "shapes-seg": _gen_shapes_seg,
        "shapes-pose": _gen_shapes_pose,
        "shapes-obb": _gen_shapes_obb,
    }[kind]
    kw = {}
    if kind.startswith("shapes") and data.get("names"):
        kw["nc"] = len(data["names"])
    if kind == "shapes-pose" and data.get("kpt_shape"):
        kw["kpt_shape"] = tuple(data["kpt_shape"])

    def _gen_into(img_dir, n, s):
        # entries follow the <root>/images/<split> layout; generators write
        # root/images/split + root/labels/split
        p = Path(img_dir)
        gen(p.parent.parent, p.name, n, imgsz, s, **kw)

    trains = data["train"] if isinstance(data["train"], list) else [data["train"]]
    for j, t in enumerate(trains):
        _gen_into(t, n_train, seed + j)
    for v in (data["val"] if isinstance(data["val"], list) else [data["val"]]):
        _gen_into(v, n_val, seed + 10_000)
    return True


def _write_sample(root: Path, split: str, i: int, img: np.ndarray, labels: list) -> None:
    (root / "images" / split).mkdir(parents=True, exist_ok=True)
    (root / "labels" / split).mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(root / "images" / split / f"{i:05d}.jpg"), img)
    lines = [f"{c} {x:.6f} {y:.6f} {w:.6f} {h:.6f}" for c, x, y, w, h in labels]
    (root / "labels" / split / f"{i:05d}.txt").write_text("\n".join(lines))


def _gen_shapes(root: Path, split: str, n: int, imgsz: int, seed: int, nc: int = 3) -> None:
    """Rectangles, circles, triangles on low-freq noise; class = any nc
    (drawn glyph cycles through the 3 shapes so arbitrary drop-in schemas —
    coco 80, lvis 1203 — synthesize with their real label space)."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        base = rng.integers(40, 160, (imgsz // 8, imgsz // 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        labels = []
        for _ in range(int(rng.integers(1, 7))):
            cls = int(rng.integers(0, nc))
            w = int(rng.uniform(0.08, 0.3) * imgsz)
            h = int(rng.uniform(0.08, 0.3) * imgsz)
            x1 = int(rng.uniform(0, imgsz - w))
            y1 = int(rng.uniform(0, imgsz - h))
            color = tuple(int(c) for c in rng.integers(100, 255, 3))
            if cls % 3 == 0:
                cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
            elif cls % 3 == 1:
                cv2.ellipse(img, (x1 + w // 2, y1 + h // 2), (w // 2, h // 2), 0, 0, 360, color, -1)
            else:
                pts = np.array([[x1 + w // 2, y1], [x1, y1 + h], [x1 + w, y1 + h]], np.int32)
                cv2.fillPoly(img, [pts], color)
            labels.append((cls, (x1 + w / 2) / imgsz, (y1 + h / 2) / imgsz, w / imgsz, h / imgsz))
        _write_sample(root, split, i, img, labels)


def _rand_polygon(rng, cx, cy, rad, n_pts=8):
    """Star-convex random polygon around (cx, cy)."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
    radii = rng.uniform(0.5, 1.0, n_pts) * rad
    return np.stack([cx + radii * np.cos(angles), cy + radii * np.sin(angles)], 1).astype(np.float32)


def _gen_shapes_seg(root: Path, split: str, n: int, imgsz: int, seed: int, nc: int = 2) -> None:
    """Instance segmentation: blob / ellipse-ish polygons over any nc;
    YOLO-seg label format = cls + normalized polygon points."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        base = rng.integers(40, 160, (imgsz // 8, imgsz // 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        lines = []
        for _ in range(int(rng.integers(1, 5))):
            cls = int(rng.integers(0, nc))
            cx, cy = rng.uniform(0.15, 0.85, 2) * imgsz
            rad = rng.uniform(0.05, 0.15) * imgsz
            poly = _rand_polygon(rng, cx, cy, rad, n_pts=8 if cls % 2 == 0 else 16)
            poly = np.clip(poly, 0, imgsz - 1)
            color = tuple(int(c) for c in rng.integers(100, 255, 3))
            cv2.fillPoly(img, [poly.astype(np.int32)], color)
            coords = " ".join(f"{v:.6f}" for v in (poly / imgsz).reshape(-1))
            lines.append(f"{cls} {coords}")
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(root / "images" / split / f"{i:05d}.jpg"), img)
        (root / "labels" / split / f"{i:05d}.txt").write_text("\n".join(lines))


def _gen_shapes_pose(root: Path, split: str, n: int, imgsz: int, seed: int,
                     nc: int = 1, kpt_shape=(5, 3)) -> None:
    """Pose: 'stick figures' = rectangle bodies with visible keypoints.
    Default layout (K=5): 4 corners + center — the shapes128-pose schema.
    Any other kpt_shape (coco [17,3], hand [21,3], dog [24,3]) lays K points
    on the inscribed ellipse so drop-in pose configs synthesize with their
    real keypoint count; ndim=2 omits the visibility column."""
    rng = np.random.default_rng(seed)
    nk, ndim = int(kpt_shape[0]), int(kpt_shape[1])
    for i in range(n):
        base = rng.integers(40, 160, (imgsz // 8, imgsz // 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        labels = []
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, nc))
            w = rng.uniform(0.1, 0.3) * imgsz
            h = rng.uniform(0.1, 0.3) * imgsz
            x1 = rng.uniform(0, imgsz - w)
            y1 = rng.uniform(0, imgsz - h)
            color = tuple(int(c) for c in rng.integers(100, 255, 3))
            cv2.rectangle(img, (int(x1), int(y1)), (int(x1 + w), int(y1 + h)), color, -1)
            if nk == 5:
                kps = np.array(
                    [[x1, y1], [x1 + w, y1], [x1 + w, y1 + h], [x1, y1 + h], [x1 + w / 2, y1 + h / 2]], np.float32
                )
            else:
                th = 2 * np.pi * np.arange(nk, dtype=np.float32) / nk
                kps = np.stack([x1 + w / 2 + w / 2 * np.cos(th), y1 + h / 2 + h / 2 * np.sin(th)], 1)
            for kx, ky in kps:
                cv2.circle(img, (int(kx), int(ky)), 4, (0, 0, 255), -1)
            row = [cls, (x1 + w / 2) / imgsz, (y1 + h / 2) / imgsz, w / imgsz, h / imgsz]
            for kx, ky in kps:
                row += [kx / imgsz, ky / imgsz] + ([2] if ndim == 3 else [])
            labels.append(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in row))
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(root / "images" / split / f"{i:05d}.jpg"), img)
        (root / "labels" / split / f"{i:05d}.txt").write_text("\n".join(labels))


def _gen_shapes_obb(root: Path, split: str, n: int, imgsz: int, seed: int, nc: int = 2) -> None:
    """Oriented boxes: rotated rectangles / elongated bars over any nc;
    DOTA-style labels = cls + 4 normalized corner points."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        base = rng.integers(40, 160, (imgsz // 8, imgsz // 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        lines = []
        for _ in range(int(rng.integers(1, 5))):
            cls = int(rng.integers(0, nc))
            cx, cy = rng.uniform(0.2, 0.8, 2) * imgsz
            if cls % 2 == 0:
                w, h = rng.uniform(0.08, 0.2, 2) * imgsz
            else:
                w, h = rng.uniform(0.2, 0.35) * imgsz, rng.uniform(0.03, 0.08) * imgsz
            ang = rng.uniform(0, 180)
            pts = cv2.boxPoints(((cx, cy), (w, h), ang))
            if pts.min() < 0 or pts.max() > imgsz - 1:
                continue
            color = tuple(int(c) for c in rng.integers(100, 255, 3))
            cv2.fillPoly(img, [pts.astype(np.int32)], color)
            coords = " ".join(f"{v:.6f}" for v in (pts / imgsz).reshape(-1))
            lines.append(f"{cls} {coords}")
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(root / "images" / split / f"{i:05d}.jpg"), img)
        (root / "labels" / split / f"{i:05d}.txt").write_text("\n".join(lines))


def _synth_iq(rng, n_samples: int, fs: float = 1.0):
    """One IQ capture: noise floor + LTE-like wideband bursts + RF narrowband
    bursts. Returns (iq complex64, events) with events in normalized
    (t0, t1, f0, f1) where f in [0,1) maps the fftshifted axis."""
    iq = (rng.normal(0, 0.05, n_samples) + 1j * rng.normal(0, 0.05, n_samples)).astype(np.complex64)
    t = np.arange(n_samples, dtype=np.float32)
    events = []
    for _ in range(int(rng.integers(1, 5))):
        cls = int(rng.integers(0, 2))
        t0 = rng.uniform(0, 0.7)
        dur = rng.uniform(0.1, 0.3) if cls == 0 else rng.uniform(0.05, 0.25)
        t1 = min(t0 + dur, 1.0)
        i0, i1 = int(t0 * n_samples), int(t1 * n_samples)
        fc = rng.uniform(-0.42, 0.42)  # cycles/sample, fftshift maps to (fc+0.5)
        if cls == 0:  # LTE-like: wideband OFDM-ish block = filtered noise, bw 5-20% of fs
            bw = rng.uniform(0.06, 0.2)
            n_seg = i1 - i0
            base = rng.normal(0, 1, n_seg) + 1j * rng.normal(0, 1, n_seg)
            # brick-wall filter in freq domain
            spec = np.fft.fft(base)
            freqs = np.fft.fftfreq(n_seg)
            spec[np.abs(freqs) > bw / 2] = 0
            sig = np.fft.ifft(spec) * rng.uniform(2.0, 6.0)
            iq[i0:i1] += (sig * np.exp(2j * np.pi * fc * t[i0:i1])).astype(np.complex64)
        else:  # RF narrowband: tone or slow chirp
            bw = rng.uniform(0.004, 0.02)
            drift = rng.uniform(-bw, bw)
            amp = rng.uniform(1.5, 5.0)
            phase = 2 * np.pi * (fc * t[i0:i1] + 0.5 * drift / max(i1 - i0, 1) * (t[i0:i1] - i0) ** 2 / max(i1 - i0, 1))
            iq[i0:i1] += (amp * np.exp(1j * phase)).astype(np.complex64)
        f_center = fc + 0.5  # fftshifted normalized position
        f0, f1 = max(f_center - bw / 2 - 0.005, 0.0), min(f_center + bw / 2 + 0.005, 1.0)
        events.append((cls, t0, t1, f0, f1))
    return iq, events


def _gen_spectrogram(root: Path, split: str, n: int, imgsz: int, seed: int) -> None:
    from spectrogram_yolov11_tpu.ops.stft import spectrogram_numpy

    rng = np.random.default_rng(seed)
    n_fft, hop = 256, 128
    n_samples = n_fft + hop * (imgsz - 1)  # exactly imgsz time frames
    for i in range(n):
        iq, events = _synth_iq(rng, n_samples)
        img01 = spectrogram_numpy(iq, n_fft=n_fft, hop=hop)  # (F=256, T=imgsz)
        img = cv2.resize((img01 * 255).astype(np.uint8), (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        labels = []
        for cls, t0, t1, f0, f1 in events:
            # rows = frequency, cols = time
            x, y = (t0 + t1) / 2, (f0 + f1) / 2
            w, h = (t1 - t0), (f1 - f0)
            labels.append((cls, x, y, w, h))
        _write_sample(root, split, i, img, labels)


def gen_cls_shapes(root: Path, split: str, n_per_class: int, imgsz: int = 160, seed: int = 0,
                   names=None) -> None:
    """Folder-per-class classification set: one dominant shape per class
    (rectangle/circle/triangle, cycling for larger schemas) on textured noise —
    the imagenette-equivalent smoke set for the classify task (zero-egress
    replacement for the reference's auto-download, data/utils.py:394
    check_cls_dataset). `names` sets the class-folder list (e.g. the
    ImageNet.yaml label space); default is the 3-shape smoke schema."""
    rng = np.random.default_rng(seed)
    for ci, name in enumerate(names if names is not None else ("rectangle", "circle", "triangle")):
        d = Path(root) / split / str(name).replace("/", "-")
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_class):
            base = rng.integers(40, 160, (imgsz // 8, imgsz // 8, 3), dtype=np.uint8)
            img = cv2.resize(base, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
            color = tuple(int(c) for c in rng.integers(120, 255, 3))
            cx, cy = (rng.uniform(0.3, 0.7, 2) * imgsz).astype(int)
            r = int(rng.uniform(0.15, 0.3) * imgsz)
            if ci % 3 == 0:
                cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), color, -1)
            elif ci % 3 == 1:
                cv2.circle(img, (cx, cy), r, color, -1)
            else:
                pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]], np.int32)
                cv2.fillPoly(img, [pts], color)
            cv2.imwrite(str(d / f"{i:05d}.jpg"), img)
