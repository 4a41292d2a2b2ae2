"""Solutions smoke + logic tests (reference runs each app over a demo video,
tests/test_solutions.py; here: synthetic frames + injected tracks)."""

import numpy as np
import pytest

from spectrogram_yolov11_tpu.solutions.solutions import point_in_polygon, segments_intersect


def test_geometry_helpers():
    poly = [(0, 0), (10, 0), (10, 10), (0, 10)]
    assert point_in_polygon((5, 5), poly)
    assert not point_in_polygon((15, 5), poly)
    assert segments_intersect((0, 5), (10, 5), (5, 0), (5, 10))
    assert not segments_intersect((0, 0), (1, 1), (5, 5), (6, 6))


@pytest.fixture(scope="module")
def frame():
    return np.random.default_rng(0).integers(0, 255, (320, 320, 3), dtype=np.uint8)


def _inject(sol, boxes, ids, clss):
    def fake_extract(im0):
        sol.boxes = np.asarray(boxes, np.float32)
        sol.track_ids = ids
        sol.clss = clss
        sol.confs = [0.9] * len(ids)

    sol.extract_tracks = fake_extract


def test_object_counter_line_crossing(frame):
    from spectrogram_yolov11_tpu.solutions import ObjectCounter

    oc = ObjectCounter(model="yolo11n.yaml", region=[(0, 160), (320, 160)])
    # frame 1: below the line; frame 2: above -> one IN count
    _inject(oc, [[100, 200, 140, 240]], [1], [0])
    oc(frame.copy())
    _inject(oc, [[100, 100, 140, 140]], [1], [0])
    oc(frame.copy())
    assert oc.in_count == 1 and oc.out_count == 0


def test_region_and_queue(frame):
    from spectrogram_yolov11_tpu.solutions import QueueManager, RegionCounter

    region = [(50, 50), (270, 50), (270, 270), (50, 270)]
    rc = RegionCounter(model="yolo11n.yaml", region=region)
    _inject(rc, [[100, 100, 140, 140], [0, 0, 10, 10]], [1, 2], [0, 0])
    rc(frame.copy())
    assert rc.region_count == 1
    qm = QueueManager(model="yolo11n.yaml", region=region)
    _inject(qm, [[100, 100, 140, 140], [120, 120, 160, 160]], [1, 2], [0, 0])
    qm(frame.copy())
    assert qm.queue_count == 2


def test_heatmap_blur_visioneye(frame):
    from spectrogram_yolov11_tpu.solutions import Heatmap, ObjectBlurrer, VisionEye

    for cls in (Heatmap, ObjectBlurrer, VisionEye):
        app = cls(model="yolo11n.yaml")
        _inject(app, [[50, 50, 90, 90]], [1], [0])
        out = app(frame.copy())
        assert out.shape[:2] == frame.shape[:2]


def test_speed_estimator(frame):
    from spectrogram_yolov11_tpu.solutions import SpeedEstimator

    se = SpeedEstimator(model="yolo11n.yaml", fps=30, meter_per_pixel=0.1)
    _inject(se, [[100, 100, 140, 140]], [1], [0])
    se(frame.copy())
    _inject(se, [[110, 100, 150, 140]], [1], [0])
    se(frame.copy())
    assert se.speeds.get(1, 0) > 0


def test_spectrum_monitor_runs():
    """The north-star solution: IQ capture -> detection reports (random weights)."""
    from spectrogram_yolov11_tpu.data.synth import _synth_iq
    from spectrogram_yolov11_tpu.solutions import SpectrumMonitor

    rng = np.random.default_rng(3)
    iq, _ = _synth_iq(rng, 256 + 128 * 255)
    sm = SpectrumMonitor(model="spectrogram_yolo11.yaml")
    img, reports = sm(iq)
    assert img.shape[-1] == 3
    assert isinstance(reports, list)


def test_streamlit_inference_headless():
    """The streamlit app's frame loop runs headlessly (the GUI itself is
    availability-gated on the streamlit package, reference
    solutions/streamlit_inference.py:14)."""
    from spectrogram_yolov11_tpu.solutions.streamlit_inference import Inference

    app = Inference(model="yolo11n.yaml")
    app.conf = 0.01
    frames = [np.full((96, 128, 3), 90, np.uint8) for _ in range(2)]
    out = app.run_headless(frames)
    assert len(out) == 2
    for annotated, r in out:
        assert annotated.shape == frames[0].shape
        assert hasattr(r, "boxes")
