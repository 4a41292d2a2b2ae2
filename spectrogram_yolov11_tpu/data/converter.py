"""Dataset converters (reference: /root/reference/ultralytics/data/converter.py).

- convert_coco: COCO instance json -> YOLO txt labels (:221)
- coco91_to_coco80_class / coco80_to_coco91_class maps (:19, :122)
- convert_dota_to_yolo_obb: DOTA corner-format -> normalized 4-point rows (:421)
- masks -> polygons helper (:343 equivalent via cv2 contours)
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import List, Optional

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


def coco91_to_coco80_class() -> List[Optional[int]]:
    """91-index -> 80-index class map (reference: converter.py:19)."""
    x = [None] * 91
    idx80 = 0
    missing = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}  # 0-based ids absent from the 80-set
    for i in range(91):
        if i in missing:
            continue
        x[i] = idx80
        idx80 += 1
    return x


def coco80_to_coco91_class() -> List[int]:
    inv = coco91_to_coco80_class()
    out = [0] * 80
    for i91, i80 in enumerate(inv):
        if i80 is not None:
            out[i80] = i91
    return out


def convert_coco(
    labels_dir: str | Path,
    save_dir: str | Path = "coco_converted",
    use_segments: bool = False,
    use_keypoints: bool = False,
    cls91to80: bool = True,
) -> Path:
    """COCO jsons -> YOLO labels (reference: converter.py:221)."""
    save_dir = Path(save_dir)
    class_map = coco91_to_coco80_class()
    for json_file in sorted(Path(labels_dir).glob("*.json")):
        blob = json.loads(json_file.read_text())
        split = json_file.stem.replace("instances_", "")
        out_dir = save_dir / "labels" / split
        out_dir.mkdir(parents=True, exist_ok=True)
        images = {img["id"]: img for img in blob["images"]}
        anns = defaultdict(list)
        for a in blob["annotations"]:
            anns[a["image_id"]].append(a)
        for img_id, img in images.items():
            h, w = img["height"], img["width"]
            lines = []
            for a in anns.get(img_id, []):
                if a.get("iscrowd"):
                    continue
                cid = a["category_id"] - 1
                cls = class_map[cid] if cls91to80 else cid
                if cls is None:
                    continue
                x, y, bw, bh = a["bbox"]
                row = [cls, (x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h]
                if use_segments and a.get("segmentation"):
                    seg = a["segmentation"]
                    if isinstance(seg, list) and seg:
                        pts = np.asarray(seg[0], np.float64).reshape(-1, 2) / [w, h]
                        row = [cls, *pts.reshape(-1).tolist()]
                if use_keypoints and a.get("keypoints"):
                    kp = np.asarray(a["keypoints"], np.float64).reshape(-1, 3)
                    kp[:, 0] /= w
                    kp[:, 1] /= h
                    row += kp.reshape(-1).tolist()
                lines.append(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in row))
            stem = Path(img["file_name"]).stem
            (out_dir / f"{stem}.txt").write_text("\n".join(lines))
    LOGGER.info(f"COCO conversion complete -> {save_dir}")
    return save_dir


def convert_dota_to_yolo_obb(dota_root: str | Path, class_names: Optional[List[str]] = None) -> None:
    """DOTA 'x1 y1 ... x4 y4 cls difficulty' txts -> normalized YOLO-OBB rows
    (reference: converter.py:421). Expects images/{split} + labelTxt-ish dirs."""
    root = Path(dota_root)
    names = class_names or [
        "plane", "ship", "storage tank", "baseball diamond", "tennis court", "basketball court",
        "ground track field", "harbor", "bridge", "large vehicle", "small vehicle", "helicopter",
        "roundabout", "soccer ball field", "swimming pool",
    ]
    name_to_id = {n: i for i, n in enumerate(names)}
    for split in ("train", "val"):
        src = root / "labels" / f"{split}_original"
        dst = root / "labels" / split
        img_dir = root / "images" / split
        if not src.exists():
            continue
        dst.mkdir(parents=True, exist_ok=True)
        for txt in src.glob("*.txt"):
            img = None
            for ext in (".png", ".jpg"):
                cand = img_dir / (txt.stem + ext)
                if cand.exists():
                    img = cv2.imread(str(cand))
                    break
            if img is None:
                continue
            h, w = img.shape[:2]
            lines = []
            for row in txt.read_text().splitlines():
                parts = row.split()
                if len(parts) < 9:
                    continue
                cls = name_to_id.get(" ".join(parts[8:-1]) or parts[8])
                if cls is None:
                    continue
                coords = np.asarray([float(v) for v in parts[:8]], np.float64)
                coords[0::2] /= w
                coords[1::2] /= h
                lines.append(f"{cls} " + " ".join(f"{v:.6g}" for v in coords))
            (dst / txt.name).write_text("\n".join(lines))
    LOGGER.info(f"DOTA conversion complete -> {root / 'labels'}")


def masks2polygons(masks: np.ndarray, epsilon: float = 2.0) -> List[np.ndarray]:
    """Binary masks (n, h, w) -> simplified polygons (reference: converter.py:343)."""
    out = []
    for m in masks.astype(np.uint8):
        cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if cs:
            c = max(cs, key=cv2.contourArea)
            c = cv2.approxPolyDP(c, epsilon, True)
            out.append(c.reshape(-1, 2).astype(np.float32))
        else:
            out.append(np.zeros((0, 2), np.float32))
    return out


def yolo_bbox2segment(im_dir, save_dir=None, sam_model: str = "vit_b") -> Optional[Path]:
    """Convert a detection dataset to segmentation labels via SAM box prompts
    (reference: data/converter.py:582).

    For each image's YOLO-format box labels, prompts our SAM predictor with
    the boxes and writes polygon labels to `labels-segment/` next to `im_dir`.
    NOTE: without converted pretrained SAM weights the masks are
    random-quality; the machinery (prompting, polygonization, label IO) is
    the component under test.
    """
    from spectrogram_yolov11_tpu.data.dataset import IMG_FORMATS, img2label_path
    from spectrogram_yolov11_tpu.models.sam import SAMPredictor
    from spectrogram_yolov11_tpu.utils import TQDM

    im_dir = Path(im_dir)
    images = sorted(f for f in im_dir.rglob("*") if f.suffix[1:].lower() in IMG_FORMATS)
    if not images:
        LOGGER.warning(f"no images under {im_dir}")
        return None
    predictor = SAMPredictor(variant=sam_model, img_size=256)
    save_dir = Path(save_dir) if save_dir else im_dir.parent / "labels-segment"
    save_dir.mkdir(parents=True, exist_ok=True)
    for im_file in TQDM(images, desc="bbox2segment"):
        lb_file = Path(img2label_path(str(im_file)))
        if not lb_file.exists():
            continue
        rows = [r.split() for r in lb_file.read_text().splitlines() if r.strip()]
        if not rows or len(rows[0]) > 5:
            continue  # empty or already segment-format
        img = cv2.imread(str(im_file))
        h, w = img.shape[:2]
        predictor.set_image(img)
        lines = []
        for r in rows:
            cls = int(r[0])
            cx, cy, bw, bh = (float(v) for v in r[1:5])
            box = [(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h]
            masks, _ = predictor.prompt(boxes=box)
            polys = masks2polygons(masks[0].astype(np.uint8))
            if polys and len(polys[0]):
                p = polys[0] / np.asarray([w, h], np.float32)
                lines.append(f"{cls} " + " ".join(f"{v:.6g}" for v in p.reshape(-1)))
        (save_dir / lb_file.name).write_text("\n".join(lines))
    LOGGER.info(f"segment labels written to {save_dir}")
    return save_dir


def masks2segments(masks: np.ndarray, strategy: str = "all") -> List[np.ndarray]:
    """Binary masks (n, h, w) -> polygon segments (reference: ops.py:809).

    strategy 'largest' keeps the biggest external contour; 'all' joins every
    contour into one polyline (multi-contour joining order is ours — the
    reference threads contours via merge_multi_segment; single-contour masks
    match it exactly)."""
    import cv2

    segments = []
    for m in np.asarray(masks).astype(np.uint8):
        cs = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if not cs:
            segments.append(np.zeros((0, 2), np.float32))
            continue
        if strategy == "largest" or len(cs) == 1:
            c = max(cs, key=len).reshape(-1, 2)
        else:  # 'all': nearest-neighbor chain through the contours
            polys = sorted((c.reshape(-1, 2) for c in cs), key=len, reverse=True)
            c = polys[0]
            for p in polys[1:]:
                d = ((c[-1] - p) ** 2).sum(1)
                j = int(d.argmin())
                c = np.concatenate([c, p[j:], p[:j]])
        segments.append(c.astype(np.float32))
    return segments
