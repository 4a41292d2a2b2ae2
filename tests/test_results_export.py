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
