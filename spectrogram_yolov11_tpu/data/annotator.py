"""Auto-annotation: detector proposes boxes, SAM turns them into polygons
(reference: /root/reference/ultralytics/data/annotator.py:8 auto_annotate)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER, TQDM


def auto_annotate(data, det_model="yolo11n.yaml", sam_model: str = "vit_b", conf: float = 0.25,
                  iou: float = 0.45, imgsz: int = 640, max_det: int = 300, classes=None,
                  output_dir=None):
    """Detect objects with `det_model`, segment each detection with SAM box
    prompts, and write YOLO segment labels (reference annotator.py:8).

    Weights: pass a trained `.ckpt` for the detector; SAM runs from converted
    weights when available (random init otherwise — the pipeline is the
    deliverable in the zero-egress environment).
    """
    import cv2

    from spectrogram_yolov11_tpu.data.converter import masks2polygons
    from spectrogram_yolov11_tpu.data.dataset import IMG_FORMATS
    from spectrogram_yolov11_tpu.engine.model import YOLO
    from spectrogram_yolov11_tpu.models.sam import SAMPredictor

    det = YOLO(det_model)
    sam = SAMPredictor(variant=sam_model, img_size=256)
    data = Path(data)
    images = sorted(f for f in ([data] if data.is_file() else data.rglob("*"))
                    if f.suffix[1:].lower() in IMG_FORMATS)
    output_dir = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    output_dir.mkdir(parents=True, exist_ok=True)
    for f in TQDM(images, desc="auto_annotate"):
        r = det.predict(str(f), conf=conf, iou=iou, imgsz=imgsz, max_det=max_det, classes=classes)[0]
        if r.boxes is None or len(r.boxes) == 0:
            (output_dir / f.with_suffix(".txt").name).write_text("")
            continue
        img = cv2.imread(str(f))
        h, w = img.shape[:2]
        sam.set_image(img)
        lines = []
        for box, cls in zip(r.boxes.xyxy, r.boxes.cls):
            masks, _ = sam.prompt(boxes=box.tolist())
            polys = masks2polygons(masks[0].astype(np.uint8))
            if polys and len(polys[0]):
                p = polys[0] / np.asarray([w, h], np.float32)
                lines.append(f"{int(cls)} " + " ".join(f"{v:.6g}" for v in p.reshape(-1)))
        (output_dir / f.with_suffix(".txt").name).write_text("\n".join(lines))
    LOGGER.info(f"auto-annotation labels written to {output_dir}")
    return output_dir
