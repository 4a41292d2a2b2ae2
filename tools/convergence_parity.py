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
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
OUT = REPO / "runs" / "parity"
DATA_DIR = REPO / "datasets" / "spectrogram_synth"
EPOCHS, IMGSZ, BATCH = 40, 320, 16

# Round-5 legs (VERDICT r4 next #4): the detect A/B at the 640px operating
# point on a 2x dataset, and a segment A/B (mask loss + proto path).
DATA640_DIR = REPO / "datasets" / "spectrogram_synth_640"
SEG_DIR = REPO / "datasets" / "shapes_seg_parity"

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


def _ref_data_yaml_640() -> Path:
    _materialize("spectrogram_synth_640.yaml")
    p = OUT / "spectrogram_synth_640_ref.yaml"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(
        f"path: {DATA640_DIR}\ntrain: images/train\nval: images/val\n"
        "names:\n  0: LTE\n  1: RF\n"
    )
    return p


def _ref_data_yaml_seg() -> Path:
    _materialize("shapes_seg_parity.yaml")
    p = OUT / "shapes_seg_parity_ref.yaml"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(
        f"path: {SEG_DIR}\ntrain: images/train\nval: images/val\n"
        "names:\n  0: blob\n  1: ellipse\n"
    )
    return p


def _materialize(yaml_name: str) -> None:
    """Generate the synthetic dataset for `yaml_name` if absent (our pipeline
    is the generator of record so BOTH frameworks train on identical files)."""
    from spectrogram_yolov11_tpu.data import check_det_dataset

    check_det_dataset(yaml_name)


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


def run_ref_640(epochs: int, seed: int = 0) -> dict:
    """640px detect leg: reference fork on CPU, 256/64-image synth set."""
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_reference

    load_reference()
    from ultralytics import YOLO  # noqa: reference package, read-only checkout

    m = YOLO(str(Path("/root/reference/ultralytics/cfg/models/11/yolo11_HCA.yaml")))
    name = f"ref640_s{seed}"
    res = m.train(data=str(_ref_data_yaml_640()), epochs=epochs, device="cpu",
                  workers=2, project=str(OUT), name=name, amp=False,
                  **{**COMMON, "imgsz": 640, "seed": seed})
    out = {"framework": "reference-torch-cpu", "leg": "det640", "epochs": epochs,
           "imgsz": 640, "seed": seed,
           "map50": float(res.box.map50), "map50_95": float(res.box.map)}
    (OUT / f"{name}_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_ours_640(epochs: int, seed: int = 0, device_augment="False") -> dict:
    from spectrogram_yolov11_tpu import YOLO

    da = {"False": False, "auto": "auto"}[str(device_augment)]
    name = f"ours640_s{seed}" + ("_da" if da else "")
    m = YOLO("spectrogram_yolo11.yaml")
    res = m.train(data="spectrogram_synth_640.yaml", epochs=epochs,
                  device_augment=da, amp=True, project=str(OUT), name=name,
                  **{**COMMON, "imgsz": 640, "seed": seed})
    out = {"framework": "spectrogram_yolov11_tpu", "leg": "det640", "epochs": epochs,
           "imgsz": 640, "seed": seed, "device_augment": str(da),
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"])}
    (OUT / f"{name}_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_ref_seg(epochs: int, seed: int = 0) -> dict:
    """Segment leg: reference yolo11n-seg on the synth instance-seg set."""
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_reference

    load_reference()
    from ultralytics import YOLO  # noqa: reference package, read-only checkout

    m = YOLO("yolo11n-seg.yaml")
    name = f"refseg_s{seed}"
    res = m.train(data=str(_ref_data_yaml_seg()), epochs=epochs, device="cpu",
                  workers=2, project=str(OUT), name=name, amp=False,
                  **{**COMMON, "imgsz": IMGSZ, "seed": seed})
    out = {"framework": "reference-torch-cpu", "leg": "segment", "epochs": epochs,
           "imgsz": IMGSZ, "seed": seed,
           "map50": float(res.box.map50), "map50_95": float(res.box.map),
           "mask_map50": float(res.seg.map50), "mask_map50_95": float(res.seg.map)}
    (OUT / f"{name}_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_ours_seg(epochs: int, seed: int = 0, resume: bool = False) -> dict:
    from spectrogram_yolov11_tpu import YOLO

    name = f"oursseg_s{seed}"
    m = YOLO("yolo11n-seg.yaml")
    res = m.train(data="shapes_seg_parity.yaml", epochs=epochs, resume=resume,
                  device_augment=False, amp=True, project=str(OUT), name=name,
                  **{**COMMON, "imgsz": IMGSZ, "seed": seed})
    out = {"framework": "spectrogram_yolov11_tpu", "leg": "segment", "epochs": epochs,
           "imgsz": IMGSZ, "seed": seed,
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"]),
           "mask_map50": float(res["metrics/mAP50(M)"]), "mask_map50_95": float(res["metrics/mAP50-95(M)"])}
    (OUT / f"{name}_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_cross_640() -> dict:
    """ref640-trained best.pt -> torch_compat ingest -> OUR validator at the
    640px benchmark operating point (no training variance: weight ingest +
    val protocol only)."""
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_reference

    load_reference()
    from spectrogram_yolov11_tpu import YOLO

    m = YOLO(str(OUT / "ref640_s0" / "weights" / "best.pt"))
    res = m.val(data="spectrogram_synth_640.yaml", imgsz=640, batch=BATCH, plots=False)
    out = {"framework": "ref-weights-through-our-val", "leg": "det640", "imgsz": 640,
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"])}
    (OUT / "cross640_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def run_cross_seg() -> dict:
    """refseg-trained best.pt -> OUR segment validator: isolates the mask
    val protocol (RLE/proto/mask-IoU path) from training variance."""
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_reference

    load_reference()
    from spectrogram_yolov11_tpu import YOLO

    m = YOLO(str(OUT / "refseg_s0" / "weights" / "best.pt"))
    res = m.val(data="shapes_seg_parity.yaml", imgsz=IMGSZ, batch=BATCH, plots=False)
    out = {"framework": "ref-weights-through-our-val", "leg": "segment", "imgsz": IMGSZ,
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"]),
           "mask_map50": float(res["metrics/mAP50(M)"]), "mask_map50_95": float(res["metrics/mAP50-95(M)"])}
    (OUT / "crossseg_metrics.json").write_text(json.dumps(out, indent=1))
    return out


def reval_ours_seg(seed: int = 0) -> dict:
    """Re-validate an already-trained oursseg best.ckpt with the CURRENT
    validator (used once in round 5: the seg leg trained while the mask
    crop-to-box fix landed; weights are unaffected, the reported metrics
    needed the fixed protocol)."""
    from spectrogram_yolov11_tpu import YOLO

    name = f"oursseg_s{seed}"
    m = YOLO(str(OUT / name / "weights" / "best.ckpt"))
    res = m.val(data="shapes_seg_parity.yaml", imgsz=IMGSZ, batch=BATCH, plots=False)
    out = {"framework": "spectrogram_yolov11_tpu", "leg": "segment", "epochs": EPOCHS,
           "imgsz": IMGSZ, "seed": seed, "checkpoint": "best",
           "map50": float(res["metrics/mAP50(B)"]), "map50_95": float(res["metrics/mAP50-95(B)"]),
           "mask_map50": float(res["metrics/mAP50(M)"]), "mask_map50_95": float(res["metrics/mAP50-95(M)"])}
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
    names += sorted(p.name for p in OUT.glob("ref640_s*_metrics.json"))
    names += sorted(p.name for p in OUT.glob("ours640_s*_metrics.json"))
    names += sorted(p.name for p in OUT.glob("refseg_s*_metrics.json"))
    names += sorted(p.name for p in OUT.glob("oursseg_s*_metrics.json"))
    names += ["cross640_metrics.json", "crossseg_metrics.json"]
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
    elif phase.startswith("ref640-seed"):
        print(run_ref_640(e, seed=int(phase[len("ref640-seed"):])))
    elif phase.startswith("ours640-seed"):
        print(run_ours_640(e, seed=int(phase[len("ours640-seed"):])))
    elif phase == "ours640-da":  # shipping-default leg: device_augment=auto
        print(run_ours_640(e, seed=0, device_augment="auto"))
    elif phase.startswith("refseg-seed"):
        print(run_ref_seg(e, seed=int(phase[len("refseg-seed"):])))
    elif phase.startswith("oursseg-resume"):
        print(run_ours_seg(e, seed=int(phase[len("oursseg-resume"):] or 0), resume=True))
    elif phase.startswith("oursseg-seed"):
        print(run_ours_seg(e, seed=int(phase[len("oursseg-seed"):])))
    elif phase == "ours-val":
        print(val_ours(s))
    elif phase == "cross":
        print(run_cross())
    elif phase == "cross640":
        print(run_cross_640())
    elif phase == "crossseg":
        print(run_cross_seg())
    elif phase.startswith("oursseg-reval"):
        print(reval_ours_seg(int(phase[len("oursseg-reval"):] or 0)))
    else:
        report()
