"""Train-to-convergence mAP parity: reference (torch, CPU) vs this framework (TPU).

The north-star claim (BASELINE.json) is matched mAP@0.5 / mAP@0.5:0.95 against
the reference on the spectrogram dataset. Loss/NMS/val-protocol parity are each
oracle-tested in tests/; this harness closes the loop end-to-end: train the
SAME architecture (our `spectrogram_yolo11.yaml` == the fork's
`yolo11_HCA.yaml`, reference/ultralytics/cfg/models/11/yolo11_HCA.yaml) from
scratch on the SAME materialized spectrogram_synth dataset with the SAME hyps,
then compare:

  1. reference-trained mAP, reference validator  (torch, tests/oracle.py stubs)
  2. ours-trained mAP, our validator             (TPU)
  3. reference-trained weights ingested via torch_compat -> OUR validator
     (cross-check: weight ingest + val protocol on real converged weights)

Usage (from repo root; phases are separate so the slow torch run can go in the
background first):
    python tools/convergence_parity.py ref   [epochs] [imgsz]   # torch CPU
    python tools/convergence_parity.py ours  [epochs] [imgsz]   # TPU
    python tools/convergence_parity.py cross                    # ref weights -> our val
    python tools/convergence_parity.py report

Results land in runs/parity/{ref,ours}/ and runs/parity/summary.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "runs" / "parity"
DATA_DIR = REPO / "datasets" / "spectrogram_synth"
EPOCHS, IMGSZ, BATCH = 40, 320, 16

# device_augment pinned to the host cv2 pipeline: the A/B must run the exact
# reference augmentation semantics, not the on-TPU resample (which matches
# cv2 only to interpolation rounding)
COMMON = dict(imgsz=IMGSZ, batch=BATCH, seed=0, deterministic=True,
              plots=False, exist_ok=True)


def _ref_data_yaml() -> Path:
    p = OUT / "spectrogram_synth_ref.yaml"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(
        f"path: {DATA_DIR}\ntrain: images/train\nval: images/val\n"
        "names:\n  0: LTE\n  1: RF\n"
    )
    return p


def run_ref(epochs: int, imgsz: int, seed: int = 0, name: str = "ref") -> dict:
    """Train + val the reference fork on CPU (torchvision/thop stubbed)."""
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_reference

    load_reference()
    from ultralytics import YOLO  # noqa: reference package, read-only checkout

    m = YOLO(str(Path("/root/reference/ultralytics/cfg/models/11/yolo11_HCA.yaml")))
    res = m.train(data=str(_ref_data_yaml()), epochs=epochs, device="cpu",
                  workers=2, project=str(OUT), name=name, amp=False,
                  **{**COMMON, "imgsz": imgsz, "seed": seed})
    out = {"framework": "reference-torch-cpu", "epochs": epochs, "imgsz": imgsz, "seed": seed,
           "map50": float(res.box.map50), "map50_95": float(res.box.map)}
    (OUT / f"{name}_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_ours(epochs: int, imgsz: int, seed: int = 0, name: str = "ours", amp: bool = True) -> dict:
    from spectrogram_yolov11_tpu import YOLO

    m = YOLO("spectrogram_yolo11.yaml")
    res = m.train(data="spectrogram_synth.yaml", epochs=epochs, device_augment=False, amp=amp,
                  project=str(OUT), name=name, **{**COMMON, "imgsz": imgsz, "seed": seed})
    out = {"framework": "spectrogram_yolov11_tpu", "epochs": epochs, "imgsz": imgsz, "seed": seed,
           "amp": amp,
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"])}
    (OUT / f"{name}_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def val_ours(imgsz: int) -> dict:
    """Re-val an already-trained runs/parity/ours/weights/best.ckpt."""
    from spectrogram_yolov11_tpu import YOLO

    m = YOLO(str(OUT / "ours" / "weights" / "best.ckpt"))
    res = m.val(data="spectrogram_synth.yaml", imgsz=imgsz, batch=BATCH, plots=False)
    prev = json.loads((OUT / "ours_metrics.json").read_text()) if (OUT / "ours_metrics.json").exists() else {}
    out = {"framework": "spectrogram_yolov11_tpu", "epochs": prev.get("epochs", EPOCHS),
           "imgsz": imgsz, "checkpoint": "best",
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"])}
    (OUT / "ours_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_cross() -> dict:
    """Reference-trained best.pt -> torch_compat ingest -> our validator."""
    # unpickling the reference checkpoint needs its class tree importable
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_reference

    load_reference()
    from spectrogram_yolov11_tpu import YOLO

    best = OUT / "ref" / "weights" / "best.pt"
    m = YOLO(str(best))
    imgsz = json.loads((OUT / "ref_metrics.json").read_text())["imgsz"]
    res = m.val(data="spectrogram_synth.yaml", imgsz=imgsz, batch=BATCH, plots=False)
    out = {"framework": "ref-weights-through-our-val",
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"])}
    (OUT / "cross_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def report() -> None:
    rows = []
    names = ["ref_metrics.json", "ours_metrics.json", "cross_metrics.json"]
    names += sorted(p.name for p in OUT.glob("ref_s*_metrics.json"))
    names += sorted(p.name for p in OUT.glob("ours_s*_metrics.json"))
    names += ["ours_f32_metrics.json"]
    for f in names:
        p = OUT / f
        if p.exists():
            r = json.loads(p.read_text())
            r["source"] = f
            rows.append(r)
    (OUT / "summary.json").write_text(json.dumps(rows, indent=1))
    for r in rows:
        tag = r["framework"] + (f" [{r['source']}]" if "s" in r.get("source", "") else "")
        print(f"{tag:55s} mAP50 {r['map50']:.4f}  mAP50-95 {r['map50_95']:.4f}")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "report"
    e = int(sys.argv[2]) if len(sys.argv) > 2 else EPOCHS
    s = int(sys.argv[3]) if len(sys.argv) > 3 else IMGSZ
    if phase == "ref":
        print(run_ref(e, s))
    elif phase == "ours":
        print(run_ours(e, s))
    elif phase.startswith("ours-seed"):  # e.g. "ours-seed1": seed-variance run
        sd = int(phase[len("ours-seed"):])
        print(run_ours(e, s, seed=sd, name=f"ours_s{sd}"))
    elif phase == "ours-f32":  # precision ablation: full-f32 train (amp=False)
        print(run_ours(e, s, name="ours_f32", amp=False))
    elif phase.startswith("ref-seed"):  # e.g. "ref-seed1": ref seed-variance run
        sd = int(phase[len("ref-seed"):])
        print(run_ref(e, s, seed=sd, name=f"ref_s{sd}"))
    elif phase == "ours-val":
        print(val_ours(s))
    elif phase == "cross":
        print(run_cross())
    else:
        report()
