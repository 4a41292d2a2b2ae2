"""Emit the drop-in dataset-config surface (cfg/datasets/*.yaml).

The reference ships 35 dataset YAMLs (reference: ultralytics/cfg/datasets/) whose
job is (a) name → class-schema resolution and (b) an auto-download script. This
build has zero egress, so each emitted config keeps the REAL schema (names, nc,
kpt_shape, flip_idx) — read from the reference configs as data — and replaces the
download script with a `synthetic:` stand-in generator key (data/synth.py): when
the dataset path is absent, a small synthetic dataset with the same label space
materializes on first use. A reference user's `yolo train data=coco8.yaml` (or
Spectrogram.yaml, the fork's own config) therefore runs out of the box.

Run from the repo root:  python tools/gen_dataset_yamls.py
Idempotent; the emitted files are committed.
"""

from __future__ import annotations

from pathlib import Path

import yaml

REF = Path("/root/reference/ultralytics/cfg/datasets")
OUT = Path(__file__).resolve().parent.parent / "spectrogram_yolov11_tpu" / "cfg" / "datasets"

# task per stem; everything absent is plain detect
TASKS = {
    "coco8-seg": "segment", "coco128-seg": "segment", "carparts-seg": "segment",
    "crack-seg": "segment", "package-seg": "segment",
    "coco8-pose": "pose", "coco-pose": "pose", "tiger-pose": "pose",
    "dog-pose": "pose", "hand-keypoints": "pose",
    "DOTAv1": "obb", "DOTAv1.5": "obb", "dota8": "obb",
    "ImageNet": "classify",
}
SYNTH_BY_TASK = {"detect": "shapes", "segment": "shapes-seg", "pose": "shapes-pose", "obb": "shapes-obb"}
# the fork's own spectrogram configs use the north-star IQ→STFT generator
SPECTRO = {"Spectrogram", "Spectrogram_lap"}
# exercise the reference's list-of-dirs train surface on the two configs that use it
MULTI_DIR = {
    "VOC": (["images/train2012", "images/train2007"], ["images/val2012"]),
    "yolo_params": (["scenes/clutter/images/train", "scenes/no_clutter/images/train"], ["images/val"]),
}

NOTES = {
    "Spectrogram": "the fork's headline config (kaggle SpectrogramYOLO); classes LTE/RF",
    "Spectrogram_lap": "the fork's local-path variant of Spectrogram.yaml; classes LTE/RF",
    "yolo_params": "multi-scene kaggle starter set; exercises list-of-dirs train paths",
}


def flow(v) -> str:
    """Single-line (wrapped) flow-style yaml for a value."""
    return yaml.safe_dump(v, default_flow_style=True, width=10_000, allow_unicode=True).strip()


def emit(stem: str, ref: dict) -> str:
    task = TASKS.get(stem, "detect")
    names = ref.get("names")
    if isinstance(names, dict):
        names = [names[k] for k in sorted(names)]
    if stem in SPECTRO:
        names = ["LTE", "RF"]
    note = NOTES.get(stem, f"{len(names)}-class {task} set")
    lines = [
        f"# {stem} — drop-in dataset config, name- and schema-compatible with the",
        f"# reference surface (reference: ultralytics/cfg/datasets/{stem}.yaml): {note}.",
        "# Zero-egress build: no download URL. When the path is missing, a synthetic",
        "# stand-in with the SAME class schema is generated on first use (data/synth.py),",
        "# so `yolo train data=" + stem + ".yaml` runs out of the box. Point `path:` at a",
        "# real copy of the dataset to train on actual data.",
        f"path: ../../../datasets/{stem.lower()}",
    ]
    if task == "classify":
        lines += ["train: train", "val: val", "", "synthetic: cls-shapes", "n_per_class: 2", "gen_imgsz: 160"]
    else:
        if stem in MULTI_DIR:
            tr, va = MULTI_DIR[stem]
            lines += [f"train: {flow(tr)}", f"val: {flow(va)}"]
        else:
            lines += ["train: images/train", "val: images/val"]
        kind = "spectrogram" if stem in SPECTRO else SYNTH_BY_TASK[task]
        lines += ["", f"synthetic: {kind}", "n_train: 16", "n_val: 8", "gen_imgsz: 320"]
    if task == "pose":
        lines += [f"kpt_shape: {flow(ref['kpt_shape'])}"]
        if ref.get("flip_idx"):
            lines += [f"flip_idx: {flow(ref['flip_idx'])}"]
    lines += ["", f"names: {flow(names)}", ""]
    return "\n".join(lines)


def main() -> None:
    n = 0
    for ref_yaml in sorted(REF.glob("*.yaml")):
        stem = ref_yaml.stem
        ref = yaml.safe_load(ref_yaml.read_text()) or {}
        if not ref.get("names") and stem not in SPECTRO:
            print(f"skip {stem}: no names")
            continue
        (OUT / f"{stem}.yaml").write_text(emit(stem, ref))
        n += 1
    print(f"emitted {n} dataset configs into {OUT}")


if __name__ == "__main__":
    main()
