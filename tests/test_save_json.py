import json
from pathlib import Path


def test_val_save_json(tmp_path):
    """save_json=True writes COCO-format predictions.json (reference
    detect/val.py pred_to_json/eval_json)."""
    import jax
    from spectrogram_yolov11_tpu.engine.validator import DetectionValidator
    from spectrogram_yolov11_tpu.nn.tasks import build_model

    m = build_model("yolo11n.yaml", nc=3, verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=160)
    val = DetectionValidator(m, v, overrides=dict(
        imgsz=160, batch=4, conf=0.001, save_json=True, plots=False,
        project=str(tmp_path), name="val", exist_ok=True, workers=0, fraction=0.5))
    val(data="shapes128.yaml")
    preds = sorted(tmp_path.glob("val*/predictions.json"))
    assert preds, "predictions.json not written"
    rows = json.loads(preds[0].read_text())
    assert rows and {"image_id", "category_id", "bbox", "score"} <= set(rows[0])
    assert len(rows[0]["bbox"]) == 4


def test_segment_val_save_json(tmp_path):
    """Segment save_json adds RLE masks and runs the segm COCO protocol
    (reference segment/val.py:249-282: single_encode + COCOeval('segm'))."""
    import jax
    import numpy as np
    from spectrogram_yolov11_tpu.engine.validator import SegmentationValidator
    from spectrogram_yolov11_tpu.nn.tasks import build_model
    from spectrogram_yolov11_tpu.ops.cocoeval import rle_decode

    m = build_model("yolo11n-seg.yaml", nc=3, verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=160)
    val = SegmentationValidator(m, v, overrides=dict(
        imgsz=160, batch=4, conf=0.001, save_json=True, plots=False,
        project=str(tmp_path), name="val", exist_ok=True, workers=0, fraction=0.25))
    res = val(data="shapes128-seg.yaml")
    rows = json.loads(sorted(tmp_path.glob("val*/predictions.json"))[0].read_text())
    assert rows and "segmentation" in rows[0]
    rle = rows[0]["segmentation"]
    assert isinstance(rle["counts"], str) and len(rle["size"]) == 2
    mask = rle_decode(rle)
    assert mask.shape == tuple(rle["size"])
    ann = json.loads(sorted(tmp_path.glob("val*/annotations.json"))[0].read_text())
    assert ann and "segmentation" in ann[0]
    # native-space masks: GT rle size == original image shape
    assert rle_decode(ann[0]["segmentation"]).shape == tuple(ann[0]["segmentation"]["size"])
    assert any(k.startswith("metrics/coco_AP") and k.endswith("(M)") for k in res)


def test_pose_val_save_json(tmp_path):
    """Pose save_json adds keypoint triplets and runs the OKS COCO protocol
    (reference pose/val.py:136+: pred_to_json keypoints + COCOeval('keypoints'))."""
    import jax
    from spectrogram_yolov11_tpu.engine.validator import PoseValidator
    from spectrogram_yolov11_tpu.nn.tasks import build_model, yaml_model_load

    cfg = yaml_model_load("yolo11n-pose.yaml")
    cfg["kpt_shape"] = [5, 3]  # match shapes128-pose.yaml
    m = build_model(cfg, nc=1, verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=160)
    val = PoseValidator(m, v, overrides=dict(
        imgsz=160, batch=4, conf=0.001, save_json=True, plots=False,
        project=str(tmp_path), name="val", exist_ok=True, workers=0, fraction=0.25))
    res = val(data="shapes128-pose.yaml")
    rows = json.loads(sorted(tmp_path.glob("val*/predictions.json"))[0].read_text())
    assert rows and "keypoints" in rows[0]
    assert len(rows[0]["keypoints"]) % 3 == 0  # flat x,y,score triplets
    ann = json.loads(sorted(tmp_path.glob("val*/annotations.json"))[0].read_text())
    assert ann and "keypoints" in ann[0] and "num_keypoints" in ann[0]
    assert any(k.startswith("metrics/coco_AP") and k.endswith("(P)") for k in res)
