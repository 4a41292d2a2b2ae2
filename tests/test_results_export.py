"""Results export surface: csv / xml / sql (reference results.py:851,878,945)."""

import numpy as np

from spectrogram_yolov11_tpu.engine.results import Results


def _res():
    img = np.zeros((80, 80, 3), np.uint8)
    det = np.array([[10, 10, 40, 50, 0.9, 0], [20, 30, 60, 70, 0.7, 1]], np.float32)
    return Results(img, "im.jpg", {0: "LTE", 1: "RF"}, boxes=det)


def test_to_csv_and_sql(tmp_path):
    r = _res()
    csv = r.to_csv()
    assert "LTE" in csv and "confidence" in csv

    db = tmp_path / "dets.db"
    r.to_sql(db_path=str(db))
    r.to_sql(db_path=str(db))  # appends
    import sqlite3

    con = sqlite3.connect(db)
    n, = con.execute("SELECT COUNT(*) FROM results").fetchone()
    names = [row[0] for row in con.execute("SELECT name FROM results")]
    con.close()
    assert n == 4 and set(names) == {"LTE", "RF"}


def test_to_xml():
    r = _res()
    try:
        xml = r.to_xml()
    except ImportError:  # pandas.to_xml needs lxml; availability-gated
        return
    assert "LTE" in xml


def test_save_txt_seg_and_pose(tmp_path):
    """save_txt writes polygons for seg results and appends keypoints for pose
    (reference results.py save_txt)."""
    import cv2

    img = np.zeros((80, 80, 3), np.uint8)
    det = np.array([[10, 10, 40, 50, 0.9, 0]], np.float32)
    mask = np.zeros((1, 80, 80), bool)
    cv2.rectangle(mask[0].view(np.uint8).reshape(80, 80), (12, 12), (38, 48), 1, -1)
    r = Results(img, "im.jpg", {0: "LTE"}, boxes=det, masks=mask)
    f = tmp_path / "seg.txt"
    r.save_txt(f)
    parts = f.read_text().split()
    assert parts[0] == "0" and len(parts) >= 9 and (len(parts) - 1) % 2 == 0  # polygon coords
    assert all(0.0 <= float(v) <= 1.0 for v in parts[1:])

    kpts = np.array([[[20, 20, 0.9], [30, 40, 0.8]]], np.float32)
    r2 = Results(img, "im.jpg", {0: "LTE"}, boxes=det, keypoints=kpts)
    f2 = tmp_path / "pose.txt"
    r2.save_txt(f2, save_conf=True)
    parts2 = f2.read_text().split()
    assert len(parts2) == 1 + 4 + 6 + 1  # cls + xywhn + 2 kpts * 3 + conf


def test_save_txt_obb(tmp_path):
    """OBB results write cls + 8 normalized corner coords (reference save_txt)."""
    img = np.zeros((100, 200, 3), np.uint8)
    obb = np.array([[100, 50, 60, 20, 0.3, 0.8, 1]], np.float32)  # cx cy w h angle conf cls
    r = Results(img, "im.jpg", {0: "a", 1: "b"}, obb=obb)
    f = tmp_path / "obb.txt"
    r.save_txt(f, save_conf=True)
    parts = f.read_text().split()
    assert parts[0] == "1" and len(parts) == 1 + 8 + 1
    assert abs(float(parts[-1]) - 0.8) < 1e-6


def test_basetensor_compat_surface():
    """Reference BaseTensor surface: cpu/numpy/cuda/to are identities on our
    numpy containers; shape mirrors .data (reference results.py:22-150)."""
    r = _res()
    b = r.boxes
    assert b.cpu() is b and b.numpy() is b and b.cuda() is b and b.to("cpu") is b
    assert b.shape == (2, 6)
    assert r.cpu() is r and r.to() is r


def test_results_update_new_verbose():
    r = _res()
    assert r.verbose() == "1 LTE, 1 RF, "
    # tracker-style write-back with ids in column 6
    det = np.array([[5, 5, 30, 30, 0.8, 0, 7]], np.float32)
    r.update(boxes=det)
    assert len(r) == 1 and r.boxes.id.tolist() == [7.0]
    assert r.verbose() == "1 LTE, "
    empty = r.new()
    assert len(empty) == 0 and empty.path == r.path and empty.verbose() == "(no detections), "
    assert r.tojson() == r.to_json()


def test_keypoints_xyn_and_obb_normalized():
    from spectrogram_yolov11_tpu.engine.results import Keypoints, OBBoxes

    k = Keypoints(np.array([[[40.0, 20.0, 0.9]]], np.float32), (80, 160))
    np.testing.assert_allclose(k.xyn, [[[0.25, 0.25]]])

    # axis-aligned rbox: hull must equal the box corners
    ob = OBBoxes(np.array([[50, 40, 20, 10, 0.0, 0.9, 1]], np.float32), (80, 160))
    np.testing.assert_allclose(ob.xyxy, [[40, 35, 60, 45]], atol=1e-4)
    n = ob.xyxyxyxyn
    assert n.shape == (1, 4, 2) and n.max() <= 1.0


def test_probs_verbose():
    img = np.zeros((32, 32, 3), np.uint8)
    r = Results(img, "x.jpg", {0: "a", 1: "b"}, probs=np.array([0.2, 0.8], np.float32))
    v = r.verbose()
    assert v.startswith("b 0.80") and "a 0.20" in v
