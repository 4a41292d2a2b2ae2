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
