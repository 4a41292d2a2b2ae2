"""Python example scripts (examples/python/): standalone TFLite runner,
standalone segmentation runner, region counter, and track-then-classify
action recognition.

Reference counterparts: examples/YOLOv8-TFLite-Python/main.py,
examples/YOLOv8-Segmentation-ONNXRuntime-Python/main.py,
examples/YOLOv8-Region-Counter/yolov8_region_counter.py and
examples/YOLOv8-Action-Recognition/action_recognition.py."""

import sys
from importlib.util import find_spec
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "examples" / "python"))


# -- tflite_inference ---------------------------------------------------------

def test_tflite_postprocess_units():
    from tflite_inference import letterbox_u8, postprocess

    img = np.full((100, 200, 3), 50, np.uint8)
    lb, gain, pad = letterbox_u8(img, 64)
    assert lb.shape == (64, 64, 3)
    assert gain == pytest.approx(64 / 200)
    # one confident box + a lower-conf duplicate (same class) + one other class
    preds = np.zeros((3, 4 + 2), np.float32)
    preds[0] = [32, 32, 10, 10, 0.9, 0.1]
    preds[1] = [33, 32, 10, 10, 0.8, 0.1]   # suppressed by NMS
    preds[2] = [10, 10, 6, 6, 0.1, 0.7]     # different class survives
    det = postprocess(preds, conf=0.25, iou=0.45, gain=gain, pad=pad, orig_hw=(100, 200))
    assert det.shape == (2, 6)
    assert set(det[:, 5].astype(int)) == {0, 1}
    # boxes unscaled into original coords
    assert (det[:, [0, 2]] <= 200).all() and (det[:, [1, 3]] <= 100).all()


def test_tflite_postprocess_nc_slices_extras():
    """Segment/pose graphs append coeff/kpt channels; nc bounds the scores."""
    from tflite_inference import postprocess

    preds = np.zeros((1, 4 + 2 + 8), np.float32)
    preds[0, :4] = [20, 20, 8, 8]
    preds[0, 4:6] = [0.05, 0.9]
    preds[0, 6:] = 5.0  # coeff tail must NOT be read as class scores
    det = postprocess(preds, conf=0.25, iou=0.45, gain=1.0, pad=(0, 0), orig_hw=(64, 64), nc=2)
    assert det.shape == (1, 6) and int(det[0, 5]) == 1 and det[0, 4] == pytest.approx(0.9)


@pytest.mark.skipif(find_spec("tensorflow") is None, reason="tensorflow not installed")
@pytest.mark.slow
def test_tflite_standalone_matches_autobackend(tmp_path):
    """The standalone runner's raw output == AutoBackend on the same artifact,
    and its detections land in original-image coords."""
    from tflite_inference import TFLiteYOLO, letterbox_u8

    from spectrogram_yolov11_tpu.engine.model import YOLO
    from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

    m = YOLO("spectrogram_yolo11.yaml")
    m._ensure_variables()
    path = m.export(format="tflite", save_dir=str(tmp_path), imgsz=64)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 80, 3)).astype(np.uint8)

    runner = TFLiteYOLO(str(path), conf=1e-4)
    out = runner(img)
    preds = max(out["raw"], key=lambda r: (r.ndim == 3, r.shape[-1] if r.ndim == 3 else 0))

    lb, _, _ = letterbox_u8(img, 64)
    ref = np.asarray(AutoBackend(path).forward(lb[None, ..., ::-1]))
    np.testing.assert_allclose(preds, ref, rtol=1e-4, atol=1e-4)

    det = out["det"]
    assert det.ndim == 2 and det.shape[1] == 6
    if len(det):
        assert (det[:, [0, 2]] <= 80).all() and (det[:, [1, 3]] <= 48).all()


# -- segmentation_inference ---------------------------------------------------

def test_seg_mask_pipeline_units():
    """coeff @ proto -> sigmoid -> box-crop -> un-letterbox resolves a square
    instance at the right place in original coords."""
    from segmentation_inference import postprocess_seg

    nc, nm, mh = 2, 4, 16  # proto at letterbox/4 (letterbox 64)
    proto = np.zeros((mh, mh, nm), np.float32)
    proto[4:12, 4:12, 0] = 8.0  # basis 0 lights an 8x8 proto square
    preds = np.zeros((2, 4 + nc + nm), np.float32)
    preds[0, :4] = [32, 32, 36, 36]          # box covering the square (letterbox px)
    preds[0, 4:6] = [0.9, 0.1]
    preds[0, 6] = 1.0                         # coeff selects basis 0
    preds[1, :4] = [32, 32, 36, 36]           # low-conf duplicate -> gated
    preds[1, 4:6] = [0.05, 0.02]
    det, masks = postprocess_seg(preds, proto, conf=0.25, iou=0.45, nc=nc,
                                 lb_hw=(64, 64), gain=1.0, pad=(0.0, 0.0), orig_hw=(64, 64))
    assert det.shape == (1, 6) and int(det[0, 5]) == 0
    assert masks.shape == (1, 64, 64)
    # instance present inside the proto square (x4 upsampled), absent outside
    assert masks[0, 32, 32] and not masks[0, 2, 2]
    ys, xs = np.nonzero(masks[0])
    assert 12 <= xs.min() and xs.max() <= 50


def test_seg_crop_mask_matches_framework():
    from segmentation_inference import crop_mask_np

    from spectrogram_yolov11_tpu.ops.losses import crop_mask

    rng = np.random.default_rng(0)
    masks = rng.random((3, 16, 16)).astype(np.float32)
    boxes = np.array([[2, 2, 10, 12], [0, 0, 16, 16], [5, 7, 6, 9]], np.float32)
    np.testing.assert_allclose(crop_mask_np(masks, boxes), np.asarray(crop_mask(masks, boxes)))


@pytest.mark.skipif(find_spec("tensorflow") is None, reason="tensorflow not installed")
@pytest.mark.slow
def test_seg_standalone_matches_autobackend(tmp_path):
    """The standalone seg runner reads the same (preds, proto) the framework
    backend produces from the artifact, and its masks live in original coords."""
    from segmentation_inference import TFLiteYOLOSeg

    from spectrogram_yolov11_tpu.engine.model import YOLO
    from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

    m = YOLO("yolo11n-seg.yaml")
    m._ensure_variables()
    path = m.export(format="tflite", save_dir=str(tmp_path), imgsz=64)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 80, 3)).astype(np.uint8)
    runner = TFLiteYOLOSeg(str(path), nc=m.model.nc, conf=1e-4)
    out = runner(img)
    assert out["masks"].shape[1:] == (48, 80)
    assert len(out["det"]) == len(out["segments"])

    from tflite_inference import letterbox_u8

    lb, _, _ = letterbox_u8(img, 64)
    ref = AutoBackend(path).forward(lb[None, ..., ::-1])
    preds_ref, proto_ref = (np.asarray(t) for t in ref)
    runner.interp.set_tensor(runner.inp["index"], lb[None, ..., ::-1].astype(runner.inp["dtype"]))
    runner.interp.invoke()
    raw = [runner.interp.get_tensor(o["index"]) for o in runner.outs]
    np.testing.assert_allclose(next(r for r in raw if r.ndim == 3), preds_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(next(r for r in raw if r.ndim == 4), proto_ref, rtol=1e-4, atol=1e-4)


# -- region_counter -----------------------------------------------------------

def test_point_in_polygon():
    from region_counter import point_in_polygon

    tri = np.array([(0, 0), (10, 0), (0, 10)], np.float32)
    assert point_in_polygon(np.array([2, 2]), tri)
    assert not point_in_polygon(np.array([8, 8]), tri)
    assert not point_in_polygon(np.array([-1, 5]), tri)
    rect = np.array([(200, 250), (440, 250), (440, 550), (200, 550)], np.float32)
    assert point_in_polygon(np.array([300, 400]), rect)
    assert not point_in_polygon(np.array([100, 400]), rect)


def test_region_counter_counts_tracks():
    """Track centers inside a region increment its count; counts reset each
    frame; cls_filter drops the other class."""
    from region_counter import count_regions

    regions = [{"name": "r", "polygon": np.array([(0, 0), (64, 0), (64, 64), (0, 64)], np.float32),
                "counts": 0, "dragging": False, "region_color": (255, 0, 0), "text_color": (0, 0, 0)}]
    det = _FakeDetector()  # track 7 center (25, 35) in-region; track 9 center (60, 30) in-region, class 1
    frames = [np.zeros((80, 96, 3), np.uint8) for _ in range(3)]
    counts = [regs[0]["counts"] for _, regs in count_regions(det, frames, regions)]
    assert counts == [2, 2, 2]
    regions[0]["counts"] = 0
    counts = [regs[0]["counts"]
              for _, regs in count_regions(det, frames, regions, cls_filter=0)]
    assert counts == [1, 1, 1]
    # region moved away -> zero
    regions[0]["polygon"] += 1000.0
    counts = [regs[0]["counts"] for _, regs in count_regions(det, frames, regions)]
    assert counts == [0, 0, 0]


# -- action_recognition -------------------------------------------------------

class _FakeDetector:
    """Deterministic stand-in for YOLO.track: one persistent track (id 7,
    class 0) plus one non-person track (id 9, class 1)."""

    def __init__(self):
        from spectrogram_yolov11_tpu.engine.results import Boxes, Results

        self._B, self._R = Boxes, Results

    def track(self, frame, conf=0.25, verbose=False):
        h, w = frame.shape[:2]
        data = np.asarray([[10, 10, 40, 60, 0.9, 0.0],
                           [50, 20, 70, 40, 0.8, 1.0]], np.float32)
        r = self._R(orig_img=frame, path="frame", names={0: "person", 1: "car"},
                    boxes=data)
        r.boxes = self._B(data, (h, w), ids=np.asarray([7, 9]))
        r.track_ids = np.asarray([7, 9])
        return [r]


def test_action_recognition_pipeline():
    """Buffering, per-track windows, one-batch classification, label records."""
    from action_recognition import ClipClassifier, recognize

    clf = ClipClassifier("yolo11n-cls.yaml", crop_size=32, max_tracks=4, window=3)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (80, 96, 3)).astype(np.uint8) for _ in range(5)]
    recs = [rec for _, rec in recognize(_FakeDetector(), clf, frames, cls_filter=0)]
    assert len(recs) == 5
    # only the class-0 track is followed
    assert all(set(r["tracks"]) == {7} for r in recs)
    # no labels until the window fills, then one per frame
    assert not recs[0]["actions"] and not recs[1]["actions"]
    for r in recs[2:]:
        assert 7 in r["actions"]
        label, prob = r["actions"][7]
        assert isinstance(label, str) and 0.0 <= prob <= 1.0


def test_boxes_id_surface():
    """Reference-parity: Boxes.id carries track ids and survives slicing."""
    from spectrogram_yolov11_tpu.engine.results import Boxes

    b = Boxes(np.zeros((3, 6), np.float32), (64, 64), ids=np.asarray([4, 5, 6]))
    assert list(b.id) == [4, 5, 6]
    assert list(b[1:].id) == [5, 6]
    assert Boxes(np.zeros((2, 6), np.float32), (64, 64)).id is None


def test_tutorial_notebook_executes(tmp_path, monkeypatch):
    """examples/tutorial.ipynb code cells run end-to-end (shrunk knobs, CPU):
    train -> val -> predict -> export -> reimport."""
    import json as _json
    from pathlib import Path as _P

    nb = _json.loads((_P(__file__).parent.parent / "examples" / "tutorial.ipynb").read_text())
    monkeypatch.chdir(tmp_path)
    ns: dict = {}
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        src = src.replace('MODEL, DATA = "yolo11n.yaml", "spectrogram_synth.yaml"',
                          'MODEL, DATA = "yolo11n.yaml", "shapes128.yaml"')
        src = src.replace("IMGSZ, EPOCHS, BATCH = 640, 10, 16",
                          "IMGSZ, EPOCHS, BATCH = 64, 1, 2")
        src = src.replace("plots=True", "plots=False, workers=0, fraction=0.1, val=False, save=True")
        exec(compile(src, "<tutorial>", "exec"), ns)
    assert ns["res"].boxes is not None
    assert _P(ns["artifact"]).exists()
