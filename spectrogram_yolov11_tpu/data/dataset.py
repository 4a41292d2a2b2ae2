"""Datasets: YOLO-format detection datasets + label caching.

Counterpart of the reference data layer (/root/reference/ultralytics/data/
base.py:21 BaseDataset, dataset.py:45 YOLODataset, utils.py:97
verify_image_label): image-dir discovery, label-txt parsing, hash-keyed label
cache, long-side-resize image loading, optional RAM cache.

Deviation (TPU-first): no torch Dataset/DataLoader — the loader
(data/build.py) is a thread-pool prefetcher producing fixed-shape numpy
batches, because the device wants static shapes and the host work is
cv2/numpy (GIL-free).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER, yaml_load
from spectrogram_yolov11_tpu.cfg import find_dataset_yaml

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference: data/utils.py:48)."""
    sa, sb = f"{Path(img_path).parent.parent.name}", ""
    p = Path(img_path)
    parts = list(p.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return str(Path(*parts).with_suffix(".txt"))


def check_det_dataset(data: str | Path | dict) -> dict:
    """Parse/validate a dataset yaml (reference: data/utils.py:301), resolving
    train/val paths relative to `path`. No auto-download (zero-egress image);
    missing paths raise with a clear message."""
    if isinstance(data, (str, Path)):
        data = yaml_load(find_dataset_yaml(data), append_filename=True)
    data = dict(data)
    for k in ("train", "val"):
        if k not in data and k == "val" and "validation" in data:
            data["val"] = data.pop("validation")
    if "names" not in data and "nc" not in data:
        raise KeyError("dataset yaml must define 'names' or 'nc'")
    if "names" not in data:
        data["names"] = {i: f"class_{i}" for i in range(data["nc"])}
    elif isinstance(data["names"], (list, tuple)):
        data["names"] = dict(enumerate(data["names"]))
    data["nc"] = len(data["names"])
    root = Path(data.get("path") or Path(data.get("yaml_file", ".")).parent)
    if not root.is_absolute():
        root = (Path(data.get("yaml_file", ".")).parent / root).resolve()
    data["path"] = root
    for k in ("train", "val", "test"):
        if data.get(k):
            if isinstance(data[k], (list, tuple)):  # list-of-dirs surface (VOC.yaml, yolo_params.yaml)
                data[k] = [str(p if (p := Path(e)).is_absolute() else root / p) for e in data[k]]
            else:
                p = Path(data[k])
                data[k] = str(p if p.is_absolute() else root / p)
    val0 = data["val"][0] if isinstance(data.get("val"), (list, tuple)) else data.get("val")
    if val0 and not Path(val0).exists():
        # synthetic datasets materialize on first use (data/synth.py)
        from spectrogram_yolov11_tpu.data.synth import maybe_generate

        if not maybe_generate(data):
            raise FileNotFoundError(f"Dataset 'val' path not found: {data['val']} (no internet in this environment)")
    return data


def check_cls_dataset(data: str | Path) -> dict:
    """Resolve/validate a folder-per-class classification dataset
    (reference: data/utils.py:394 check_cls_dataset).

    Accepts an absolute path, a name under the settings datasets_dir, or a
    dataset yaml (reference surface: `task=classify data=ImageNet.yaml`) whose
    `names` fixes the class-folder schema. Missing datasets are synthesized
    (shapes classes) instead of downloaded — zero-egress build.
    Returns {train, val, nc, names}.
    """
    from spectrogram_yolov11_tpu.utils import LOGGER, SETTINGS

    if str(data).endswith((".yaml", ".yml")):
        spec = yaml_load(find_dataset_yaml(data), append_filename=True)
        root = Path(spec.get("path") or ".")
        if not root.is_absolute():
            root = (Path(spec["yaml_file"]).parent / root).resolve()
        if not (root / str(spec.get("train", "train"))).exists():
            names = spec.get("names")
            names = [names[k] for k in sorted(names)] if isinstance(names, dict) else list(names)
            npc = int(spec.get("n_per_class", 2))
            imgsz = int(spec.get("gen_imgsz", 160))
            from spectrogram_yolov11_tpu.data.synth import gen_cls_shapes

            LOGGER.info(f"Generating synthetic classification stand-in at {root} ({len(names)} classes)...")
            gen_cls_shapes(root, str(spec.get("train", "train")), npc, imgsz, names=names)
            gen_cls_shapes(root, str(spec.get("val", "val")), max(1, npc // 2), imgsz, seed=10_000, names=names)
        data = root

    root = Path(data)
    if not root.is_absolute() and not root.exists():
        root = Path(SETTINGS.get("datasets_dir", ".")) / root
    if not (root / "train").exists():
        from spectrogram_yolov11_tpu.data.synth import gen_cls_shapes

        LOGGER.info(f"Generating synthetic classification dataset at {root}...")
        gen_cls_shapes(root, "train", 32)
        gen_cls_shapes(root, "val", 8, seed=10_000)
    val = root / "val" if (root / "val").exists() else (root / "test" if (root / "test").exists() else None)
    names = sorted(d.name for d in (root / "train").iterdir() if d.is_dir())
    if not names:
        raise FileNotFoundError(f"no class folders under {root / 'train'}")
    return {"train": str(root / "train"), "val": str(val) if val else None,
            "nc": len(names), "names": dict(enumerate(names))}


class YOLODataset:
    """Detection dataset over an images dir + YOLO label txts."""

    def __init__(
        self,
        img_path: str | Path,
        imgsz: int = 640,
        augment: bool = False,
        hyp=None,
        nc: int = 80,
        max_gt: int = 128,
        single_cls: bool = False,
        fraction: float = 1.0,
        cache: bool | str = False,
        task: str = "detect",
        kpt_shape=(17, 3),
        flip_idx=None,
        mask_ratio: int = 4,
        device_augment: bool = False,
    ):
        # reference surface (data/base.py get_img_files): img_path may be one
        # dir, a .txt file list, or a LIST of dirs (VOC.yaml, yolo_params.yaml)
        self.img_path = [Path(p) for p in img_path] if isinstance(img_path, (list, tuple)) else Path(img_path)
        self.imgsz = imgsz
        self.nc = nc
        self.single_cls = single_cls
        self.task = task
        self.kpt_shape = tuple(kpt_shape or (17, 3))
        self.im_files = self._find_images(fraction)
        self.label_files = [img2label_path(f) for f in self.im_files]
        self.labels = self._load_labels()
        if not max_gt:  # auto: size the static GT pad to THIS dataset
            # TAL builds (B, max_gt, A) tensors, so an oversized pad is pure
            # HBM traffic (round-3 train profile: the assigner cost 7x the
            # forward at max_gt=128 on ~8-GT spectrogram scenes). Mosaic can
            # merge up to 4 images' labels; cap at the reference-equivalent
            # 128 and keep a floor of 32.
            ml = max((len(l.get("cls", ())) for l in self.labels), default=0)
            per_img = ml * (4 if augment else 1)
            max_gt = int(min(128, max(32, -(-int(per_img * 1.1) // 8) * 8)))
        self.max_gt = max_gt
        self.cache_ram = cache in (True, "ram")
        self.cache_disk = cache == "disk"
        self._im_cache: Dict[int, np.ndarray] = {}
        from .augment import TrainTransform, ValTransform

        if augment:
            self.transform = TrainTransform(self, imgsz, hyp, max_gt=max_gt, task=task,
                                            kpt_shape=self.kpt_shape, flip_idx=flip_idx, mask_ratio=mask_ratio,
                                            device_mode=device_augment)
        else:
            self.transform = ValTransform(imgsz, max_gt=max_gt, task=task,
                                          kpt_shape=self.kpt_shape, mask_ratio=mask_ratio)
        self.augment = augment

    def _find_images(self, fraction: float) -> List[str]:
        files: List[str] = []
        for p in (self.img_path if isinstance(self.img_path, list) else [self.img_path]):
            if p.is_dir():
                files += sorted(str(f) for f in p.rglob("*") if f.suffix[1:].lower() in IMG_FORMATS)
            elif p.is_file() and p.suffix == ".txt":
                base = p.parent
                files += sorted(str((base / line.strip()).resolve()) for line in p.read_text().splitlines() if line.strip())
            else:
                raise FileNotFoundError(f"image path not found: {p}")
        if not files:
            raise FileNotFoundError(f"no images found in {self.img_path}")
        if fraction < 1.0:
            files = files[: max(1, round(len(files) * fraction))]
        return files

    def _cache_path(self) -> Path:
        p = self.img_path[0] if isinstance(self.img_path, list) else self.img_path
        return Path(str(p).rstrip("/")).with_suffix(f".labels.{self.task}.json")

    def _hash(self) -> str:
        h = hashlib.sha256()
        for f in self.im_files + self.label_files:
            h.update(f.encode())
            try:
                h.update(str(Path(f).stat().st_mtime_ns).encode())
            except OSError:
                pass
        return h.hexdigest()

    def _parse_row(self, parts: List[str]) -> Optional[Dict]:
        """One label row -> dict with xywhn (+segments/keypoints per task).

        Formats (reference data/utils.py:97 verify_image_label):
          detect:  cls cx cy w h
          segment: cls x1 y1 x2 y2 ... (polygon; bbox derived)
          obb:     cls x1 y1 ... x4 y4 (4 corners; kept as polygon)
          pose:    cls cx cy w h  kx ky v  * nk
        """
        c = int(float(parts[0]))
        vals = [float(x) for x in parts[1:]]
        if self.task == "segment" and len(vals) >= 6 and len(vals) % 2 == 0:
            pts = np.asarray(vals, np.float32).reshape(-1, 2)
            lo, hi = pts.min(0), pts.max(0)
            xywh = [(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]]
            return {"cls": c, "xywhn": xywh, "seg": pts.tolist()}
        if self.task == "obb" and len(vals) == 8:
            pts = np.asarray(vals, np.float32).reshape(4, 2)
            lo, hi = pts.min(0), pts.max(0)
            xywh = [(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]]
            return {"cls": c, "xywhn": xywh, "seg": pts.tolist()}
        if self.task == "pose":
            nk, nd = self.kpt_shape
            if len(vals) == 4 + nk * nd:
                kpts = np.asarray(vals[4:], np.float32).reshape(nk, nd)
                if nd == 2:
                    kpts = np.concatenate([kpts, np.ones((nk, 1), np.float32)], 1)
                return {"cls": c, "xywhn": vals[:4], "kpt": kpts.tolist()}
            return None
        if len(vals) >= 4:
            xywh = vals[:4]
            if 0 < xywh[2] <= 1.0001 and 0 < xywh[3] <= 1.0001:
                return {"cls": c, "xywhn": xywh}
        return None

    def _load_labels(self) -> List[Dict]:
        """Parse label txts with a JSON cache keyed by the file-list hash
        (reference: dataset.py:66 cache_labels)."""
        cache_file = self._cache_path()
        key = self._hash()
        if cache_file.exists():
            try:
                blob = json.loads(cache_file.read_text())
                if blob.get("hash") == key:
                    return [self._label_from_json(l) for l in blob["labels"]]
            except (json.JSONDecodeError, KeyError):
                pass
        labels = []
        n_miss = n_bad = 0
        for lf in self.label_files:
            rows = []
            pth = Path(lf)
            if pth.exists():
                for line in pth.read_text().splitlines():
                    parts = line.split()
                    if len(parts) < 5:
                        continue
                    try:
                        row = self._parse_row(parts)
                    except ValueError:
                        row = None
                    if row is None:
                        n_bad += 1
                    else:
                        rows.append(row)
            else:
                n_miss += 1
            lab = {
                "cls": np.asarray([r["cls"] for r in rows], np.int32),
                "xywhn": np.asarray([r["xywhn"] for r in rows], np.float32).reshape(-1, 4),
            }
            if self.task in {"segment", "obb"}:
                lab["segments"] = [np.asarray(r["seg"], np.float32) for r in rows]
            if self.task == "pose":
                nk = self.kpt_shape[0]
                lab["keypoints"] = (
                    np.asarray([r["kpt"] for r in rows], np.float32).reshape(-1, nk, 3)
                    if rows
                    else np.zeros((0, nk, 3), np.float32)
                )
            labels.append(lab)
        if n_miss or n_bad:
            LOGGER.info(f"labels: {n_miss} missing files, {n_bad} bad rows skipped")
        try:
            blob = {"hash": key, "labels": [self._label_to_json(l) for l in labels]}
            cache_file.write_text(json.dumps(blob))
        except OSError:
            pass
        return labels

    def _label_to_json(self, l: Dict) -> Dict:
        out = {"cls": l["cls"].tolist(), "xywhn": l["xywhn"].tolist()}
        if "segments" in l:
            out["segments"] = [p.tolist() for p in l["segments"]]
        if "keypoints" in l:
            out["keypoints"] = l["keypoints"].tolist()
        return out

    def _label_from_json(self, l: Dict) -> Dict:
        out = {"cls": np.asarray(l["cls"], np.int32), "xywhn": np.asarray(l["xywhn"], np.float32).reshape(-1, 4)}
        if "segments" in l:
            out["segments"] = [np.asarray(p, np.float32) for p in l["segments"]]
        if "keypoints" in l:
            nk = self.kpt_shape[0]
            out["keypoints"] = np.asarray(l["keypoints"], np.float32).reshape(-1, nk, 3)
        return out

    def __len__(self):
        return len(self.im_files)

    def load_image(self, i: int) -> np.ndarray:
        if self.cache_ram and i in self._im_cache:
            return self._im_cache[i]
        if self.cache_disk:  # decoded-image .npy sidecar (reference: base.py:189 cache='disk')
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                try:
                    return np.load(npy)
                except (OSError, ValueError):  # truncated sidecar: fall through and rewrite
                    pass
        img = cv2.imread(self.im_files[i])  # BGR HWC
        if img is None:
            raise FileNotFoundError(f"image not found / unreadable: {self.im_files[i]}")
        if self.cache_ram:
            self._im_cache[i] = img
        elif self.cache_disk:
            try:
                np.save(Path(self.im_files[i]).with_suffix(".npy"), img)
            except OSError as e:  # read-only dataset dir: keep running uncached
                LOGGER.warning(f"disk cache write failed ({e}); continuing uncached")
                self.cache_disk = False
        return img

    def load_sample(self, i: int, square_to: Optional[int] = None) -> Dict:
        """Image + pixel-xyxy labels; long-side resize to imgsz
        (reference: base.py:151 load_image rescale convention)."""
        img = self.load_image(i)
        h0, w0 = img.shape[:2]
        if square_to:
            r = square_to / max(h0, w0)
            if r != 1:
                img = cv2.resize(
                    img,
                    (min(int(w0 * r), square_to), min(int(h0 * r), square_to)),
                    interpolation=cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA,
                )
        h, w = img.shape[:2]
        lab = self.labels[i]
        cls = lab["cls"].copy()
        if self.single_cls:
            cls = np.zeros_like(cls)
        xywhn = lab["xywhn"]
        if len(xywhn):
            b = np.empty((len(xywhn), 4), np.float32)
            b[:, 0] = (xywhn[:, 0] - xywhn[:, 2] / 2) * w
            b[:, 1] = (xywhn[:, 1] - xywhn[:, 3] / 2) * h
            b[:, 2] = (xywhn[:, 0] + xywhn[:, 2] / 2) * w
            b[:, 3] = (xywhn[:, 1] + xywhn[:, 3] / 2) * h
        else:
            b = np.zeros((0, 4), np.float32)
        out = {"img": img, "cls": cls, "bboxes": b, "ori_shape": (h0, w0)}
        if "segments" in lab:
            out["segments"] = [p * np.asarray([w, h], np.float32) for p in lab["segments"]]
        if "keypoints" in lab:
            k = lab["keypoints"].copy()
            k[..., 0] *= w
            k[..., 1] *= h
            out["keypoints"] = k
        return out

    def get_item(self, i: int, rng) -> Dict[str, np.ndarray]:
        if self.augment:
            return self.transform(i, rng)
        return self.transform(self.load_sample(i), rng)

    def close_mosaic(self):
        if self.augment and hasattr(self.transform, "close_mosaic"):
            self.transform.close_mosaic()


class YOLOMultiModalDataset(YOLODataset):
    """YOLODataset that also yields per-sample class-name texts for
    vision-language (world) training (reference: dataset.py:251)."""

    def __init__(self, *args, names: Optional[dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.names = dict(names or {})

    def get_item(self, i: int, rng) -> Dict[str, np.ndarray]:
        item = super().get_item(i, rng)
        # reference update_labels_info splits multi-word names into variants;
        # here each class contributes its full phrase
        item["texts"] = [str(self.names.get(c, c)) for c in sorted(self.names or
                                                                   range(self.nc))]
        return item


class GroundingDataset(YOLODataset):
    """Phrase-grounding detection dataset (reference: dataset.py:283).

    Reads a COCO-style json where each image carries a caption and each
    annotation marks its phrase via `tokens_positive` spans; classes are the
    per-image phrase vocabulary (so `cls` indexes into this sample's `texts`
    list, not a global names map). Samples yield an extra `texts` key whose
    embeddings feed the world model's (B, K, ct) txt_feats input.

    Scope: augment=False (mosaic would merge incompatible per-image phrase
    spaces; the reference handles that via text-aware mix transforms — noted
    as the remaining grounding-train gap).
    """

    def __init__(self, img_path, json_file, imgsz: int = 640, max_gt: int = 128,
                 embed_phrases: int = 0, **kwargs):
        self.json_file = str(json_file)
        self.embed_phrases = int(embed_phrases)  # >0: attach (K, ct) txt_feats per item
        kwargs.pop("augment", None)
        super().__init__(img_path, imgsz=imgsz, augment=False, max_gt=max_gt,
                         task="detect", **kwargs)

    def _find_images(self, fraction: float = 1.0):
        # image list comes from the annotation json, not a directory walk
        return []

    def _load_labels(self) -> List[Dict]:
        anns = json.loads(Path(self.json_file).read_text())
        images = {int(im["id"]): im for im in anns["images"]}
        per_img: Dict[int, list] = {}
        for a in anns["annotations"]:
            per_img.setdefault(int(a["image_id"]), []).append(a)
        labels = []
        self.texts: List[List[str]] = []
        for img_id, rows in per_img.items():
            im = images[img_id]
            f = Path(self.img_path) / im["file_name"]
            if not f.exists():
                continue
            h, w, caption = float(im["height"]), float(im["width"]), im["caption"]
            cat2id: Dict[str, int] = {}
            texts: List[str] = []
            cls, xywhn = [], []
            for a in rows:
                if a.get("iscrowd"):
                    continue
                bx = np.asarray(a["bbox"], np.float32)  # COCO ltwh pixels
                cx, cy = bx[0] + bx[2] / 2, bx[1] + bx[3] / 2
                box = [cx / w, cy / h, bx[2] / w, bx[3] / h]
                if box[2] <= 0 or box[3] <= 0:
                    continue
                phrase = " ".join(caption[t0:t1] for t0, t1 in a["tokens_positive"])
                if phrase not in cat2id:
                    cat2id[phrase] = len(cat2id)
                    texts.append(phrase)
                if [cat2id[phrase]] + box not in [[c] + b for c, b in zip(cls, xywhn)]:
                    cls.append(cat2id[phrase])
                    xywhn.append(box)
            self.im_files.append(str(f))
            self.label_files.append("")
            self.texts.append(texts)
            labels.append({
                "cls": np.asarray(cls, np.int32),
                "xywhn": np.asarray(xywhn, np.float32).reshape(-1, 4),
            })
        return labels

    def get_item(self, i: int, rng) -> Dict[str, np.ndarray]:
        item = super().get_item(i, rng)
        item["texts"] = list(self.texts[i])
        if self.embed_phrases:  # attach padded (K, ct) txt_feats per sample
            from spectrogram_yolov11_tpu.nn.tasks import WorldModel

            K = self.embed_phrases
            texts = item.pop("texts")[:K]
            texts = texts + [""] * (K - len(texts))
            item["txt_feats"] = np.asarray(WorldModel.text_embeddings(texts)[0], np.float32)
        return item


class YOLOConcatDataset:
    """Concatenation of YOLO datasets trained as one corpus
    (reference: dataset.py:358; torch's ConcatDataset + shared collate)."""

    def __init__(self, datasets: list):
        assert datasets, "need at least one dataset"
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for d in self.datasets:
            self._offsets.append(total)
            total += len(d)
        self._total = total
        self.im_files = [f for d in self.datasets for f in getattr(d, "im_files", [])]

    def __len__(self) -> int:
        return self._total

    def _locate(self, i: int):
        assert 0 <= i < self._total, f"index {i} out of range {self._total}"
        for k in range(len(self.datasets) - 1, -1, -1):
            if i >= self._offsets[k]:
                return self.datasets[k], i - self._offsets[k]
        raise IndexError(i)

    def get_item(self, i: int, rng) -> Dict[str, np.ndarray]:
        d, j = self._locate(i)
        return d.get_item(j, rng)

    def close_mosaic(self) -> None:
        for d in self.datasets:
            if hasattr(d, "close_mosaic"):
                d.close_mosaic()


class HUBDatasetStats:
    """Dataset statistics JSON for the (local) HUB registry
    (reference: data/utils.py:472; downloads/zips replaced by direct paths).

    get_json() returns {split: {"instance_stats", "image_stats", "labels"}}
    matching the reference schema; save=True writes stats.json next to the
    dataset (or into the hub registry when `registry` is set).
    """

    def __init__(self, path: str = "shapes128.yaml", task: str = "detect"):
        self.task = task
        self.data = check_det_dataset(path)
        self.stats: dict = {"nc": self.data["nc"], "names": {int(k): v for k, v in self.data["names"].items()}}

    def get_json(self, save: bool = False, verbose: bool = False) -> dict:
        for split in ("train", "val", "test"):
            p = self.data.get(split)
            if not p or not Path(p).exists():
                self.stats[split] = None
                continue
            ds = YOLODataset(p, augment=False, nc=self.data["nc"], task=self.task,
                             kpt_shape=self.data.get("kpt_shape", (17, 3)))
            counts = np.zeros(self.data["nc"], np.int64)
            labels = []
            for f, lab in zip(ds.im_files, ds.labels):
                np.add.at(counts, lab["cls"], 1)
                rows = [[int(c), *(round(float(x), 4) for x in xywh)]
                        for c, xywh in zip(lab["cls"], lab["xywhn"])]
                labels.append({Path(f).name: rows})
            self.stats[split] = {
                "instance_stats": {"total": int(counts.sum()), "per_class": counts.tolist()},
                "image_stats": {"total": len(ds.im_files), "unlabelled": int(sum(not len(l["cls"]) for l in ds.labels)),
                                "per_class": [int((np.asarray([c in l["cls"] for l in ds.labels])).sum())
                                              for c in range(self.data["nc"])]},
                "labels": labels,
            }
            if verbose:
                from spectrogram_yolov11_tpu.utils import LOGGER

                LOGGER.info(f"{split}: {self.stats[split]['image_stats']}")
        if save:
            out = Path(self.data["path"]) / "stats.json"
            out.write_text(json.dumps(self.stats))
        return self.stats


class ClassificationDataset:
    """root/{class_name}/img.jpg layout (reference: dataset.py:389)."""

    def __init__(self, root: str | Path, imgsz: int = 224, augment: bool = False):
        self.root = Path(root)
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [
            (str(f), self.class_to_idx[d.name])
            for d in self.root.iterdir()
            if d.is_dir()
            for f in sorted(d.rglob("*"))
            if f.suffix[1:].lower() in IMG_FORMATS
        ]
        self.imgsz = imgsz
        self.augment = augment
        self.names = {i: c for c, i in self.class_to_idx.items()}

    def __len__(self):
        return len(self.samples)

    def get_item(self, i: int, rng) -> Dict[str, np.ndarray]:
        """Train: RandomResizedCrop + hflip + HSV jitter + random erasing
        (reference augment.py:2403 classify_augmentations); val: short-side
        resize + center crop (reference :2346 classify_transforms)."""
        path, label = self.samples[i]
        img = cv2.imread(path)
        h, w = img.shape[:2]
        S = self.imgsz
        if self.augment:
            # RandomResizedCrop: area scale [0.08, 1], aspect [3/4, 4/3]
            for _ in range(10):
                area = h * w * rng.uniform(0.08, 1.0)
                ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                cw, ch = int(round(np.sqrt(area * ar))), int(round(np.sqrt(area / ar)))
                if 0 < cw <= w and 0 < ch <= h:
                    x0, y0 = int(rng.integers(0, w - cw + 1)), int(rng.integers(0, h - ch + 1))
                    img = img[y0 : y0 + ch, x0 : x0 + cw]
                    break
            img = cv2.resize(img, (S, S), interpolation=cv2.INTER_LINEAR)
            if rng.random() < 0.5:
                img = np.ascontiguousarray(np.fliplr(img))
            from spectrogram_yolov11_tpu.data.augment import augment_hsv

            augment_hsv(img, 0.015, 0.4, 0.4, rng)
            if rng.random() < 0.4:  # random erasing
                ew, eh = (rng.uniform(0.05, 0.25, 2) * S).astype(int)
                ex, ey = int(rng.integers(0, S - ew)), int(rng.integers(0, S - eh))
                img[ey : ey + eh, ex : ex + ew] = rng.integers(0, 255, (eh, ew, 3), dtype=np.uint8)
        else:
            r = S / min(h, w)
            img = cv2.resize(img, (max(S, int(round(w * r))), max(S, int(round(h * r)))),
                             interpolation=cv2.INTER_LINEAR)
            hh, ww = img.shape[:2]
            y0, x0 = (hh - S) // 2, (ww - S) // 2
            img = img[y0 : y0 + S, x0 : x0 + S]
        return {"img": np.ascontiguousarray(img[..., ::-1]), "cls": np.int32(label)}


def autosplit(path: str | Path, weights: tuple = (0.9, 0.1, 0.0), annotated_only: bool = False) -> None:
    """Split an images directory into autosplit_{train,val,test}.txt lists
    (reference: data/utils.py:667 — same seeded draw so the same tree splits
    identically: random.seed(0) + random.choices over the sorted files)."""
    import random

    path = Path(path)
    files = sorted(x for x in path.rglob("*.*") if x.suffix[1:].lower() in IMG_FORMATS)
    random.seed(0)
    indices = random.choices([0, 1, 2], weights=weights, k=len(files))
    txt = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for x in txt:
        (path.parent / x).unlink(missing_ok=True)
    LOGGER.info(f"Autosplitting images from {path}" + ", using *.txt labeled images only" * annotated_only)
    for i, img in zip(indices, files):
        if not annotated_only or Path(img2label_path(str(img))).exists():
            with open(path.parent / txt[i], "a", encoding="utf-8") as f:
                f.write(f"./{img.relative_to(path.parent).as_posix()}" + "\n")
