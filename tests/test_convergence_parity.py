"""Trained-convergence mAP parity evidence (round-3 verdict missing #1).

tools/convergence_parity.py trains the SAME architecture (our
spectrogram_yolo11.yaml == the fork's yolo11_HCA.yaml) from scratch on the
SAME materialized spectrogram_synth dataset with the SAME hyps/seed in BOTH
frameworks (reference torch on CPU, ours on TPU), cross-ingests the
reference-trained weights through our validator, and writes
runs/parity/summary.json. This test asserts the committed evidence:

- |ref-trained mAP50-95  -  ours-trained mAP50-95| small (seed-noise scale
  on the 32-image val split: one image ~= 0.03 mAP);
- ref weights through OUR validator agree with the ref validator's own
  number (isolates weight ingest + val protocol from training variance).
"""

import json
from pathlib import Path

import pytest

SUMMARY = Path(__file__).parents[1] / "runs" / "parity" / "summary.json"


@pytest.fixture(scope="module")
def rows():
    if not SUMMARY.exists():
        pytest.skip("runs/parity/summary.json not generated (run tools/convergence_parity.py)")
    by = {r["framework"]: r for r in json.loads(SUMMARY.read_text())}
    return by


def test_summary_has_all_three_measurements(rows):
    assert "reference-torch-cpu" in rows
    assert "spectrogram_yolov11_tpu" in rows
    assert "ref-weights-through-our-val" in rows


def test_trained_map_parity(rows):
    ref, ours = rows["reference-torch-cpu"], rows["spectrogram_yolov11_tpu"]
    assert ref["epochs"] == ours["epochs"] and ref["imgsz"] == ours["imgsz"]
    # 32-image val: one borderline image moves mAP50-95 by ~0.03; the A/B plus
    # the seed-variance runs (ours_s*_metrics.json) bound the gap at that scale
    assert abs(ref["map50_95"] - ours["map50_95"]) <= 0.05
    assert abs(ref["map50"] - ours["map50"]) <= 0.08
    # both converged (the dataset is easy; an unconverged run sits far lower)
    assert ours["map50"] > 0.85 and ref["map50"] > 0.85


def test_cross_ingest_val_protocol_agreement(rows):
    """Reference-trained weights -> torch_compat ingest -> OUR validator must
    reproduce the reference validator's number tightly: no training variance
    in this leg, only weight conversion + val protocol."""
    ref, cross = rows["reference-torch-cpu"], rows["ref-weights-through-our-val"]
    assert abs(ref["map50_95"] - cross["map50_95"]) <= 0.02
    assert abs(ref["map50"] - cross["map50"]) <= 0.02


def test_seed_variance_context():
    """If seed-variance runs exist, the ref number lies within (or near) the
    spread of ours-trained results across seeds."""
    parity = SUMMARY.parent
    seeds = sorted(parity.glob("ours_s*_metrics.json"))
    if not (SUMMARY.exists() and seeds):
        pytest.skip("no seed-variance runs")
    base = json.loads((parity / "ours_metrics.json").read_text())
    vals = [base["map50_95"]] + [json.loads(p.read_text())["map50_95"] for p in seeds]
    ref = next(r for r in json.loads(SUMMARY.read_text()) if r["framework"] == "reference-torch-cpu")
    spread = max(vals) - min(vals)
    gap = abs(ref["map50_95"] - sum(vals) / len(vals))
    # the ref-vs-ours gap is within ~2x the observed seed spread of ours alone
    assert gap <= max(0.03, 2.0 * spread)
