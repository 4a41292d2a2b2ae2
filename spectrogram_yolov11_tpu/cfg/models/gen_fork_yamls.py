"""Materialize the fork's full model-config zoo (dev tool).

The reference ships 144 config YAMLs under cfg/models/11/ plus 16 under
cfg/models/v10/ — hand-edited structural experiments over the yolo11/yolov10
skeletons (attention insertions, ghost/max downsample swaps, Fusion/BiFPN
necks, sand/noP5/p2 scale variants; SURVEY 2.13). These files are pure
configuration DATA: lists of [from, repeats, Module, args] rows. This tool
parses each reference file structurally (yaml.safe_load, comments dropped)
and re-emits it in our canonical dialect so the whole zoo is buildable here.

Run (requires the read-only reference mount; the materialized files are the
shipped product, this script is not needed at runtime):

    python -m spectrogram_yolov11_tpu.cfg.models.gen_fork_yamls

Known-broken reference configs are skipped (they do not build in the
reference either):
    yolo11_DYHEAD.yaml — head module DyHeadBlock is commented out in the
    reference (nn/modules/head.py:915) and never registered in parse_model.
"""

from __future__ import annotations

from pathlib import Path

import yaml

REFERENCE = Path("/root/reference/ultralytics/cfg/models")
OUT = Path(__file__).parent

# curated copies live at models/11/*.yaml and models/v10/*.yaml already
CURATED = {
    "yolo11.yaml", "yolo11-seg.yaml", "yolo11-pose.yaml", "yolo11-obb.yaml", "yolo11-cls.yaml",
    "yolov10n.yaml", "yolov10s.yaml", "yolov10m.yaml", "yolov10b.yaml", "yolov10l.yaml", "yolov10x.yaml",
}
BROKEN = {"yolo11_DYHEAD.yaml"}


def _fmt(v) -> str:
    """One YAML scalar/list in flow style."""
    if isinstance(v, bool):
        return str(v)
    if v is None:
        return "None"
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    return repr(v)


def emit(d: dict, src_name: str, out_path: Path) -> None:
    lines = [
        f"# {out_path.stem} — fork config family (structural import of the reference",
        f"# cfg/models/.../{src_name}; regenerate with gen_fork_yamls.py)",
    ]
    for key, val in d.items():
        if key in ("backbone", "head"):
            continue
        if key == "scales" and isinstance(val, dict):
            lines.append("scales:")
            for s, triple in val.items():
                lines.append(f"  {s}: {_fmt(triple)}")
        elif isinstance(val, (list, tuple)):
            lines.append(f"{key}: {_fmt(val)}")
        else:
            lines.append(f"{key}: {val}")
    for section in ("backbone", "head"):
        rows = d.get(section) or []
        lines.append(f"{section}:")
        for row in rows:
            f, n, mod, args = row[0], row[1], row[2], (row[3] if len(row) > 3 else [])
            lines.append(f"  - [{_fmt(f)}, {n}, {mod}, {_fmt(args)}]")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text("\n".join(lines) + "\n")


def main() -> int:
    count = 0
    # fork experiment families (land under <family>/fork/)
    for sub, out_sub in (("11", "11/fork"), ("v10", "v10/fork")):
        for f in sorted((REFERENCE / sub).glob("*.yaml")):
            if f.name in CURATED or f.name in BROKEN:
                continue
            d = yaml.safe_load(f.read_text())
            emit(d, f.name, OUT / out_sub / f.name)
            count += 1
    # stock model families (land directly under <family>/); curated files
    # already hand-written here are left alone
    for sub in ("v3", "v5", "v6", "v8", "v9", "rt-detr"):
        for f in sorted((REFERENCE / sub).glob("*.yaml")):
            if f.name in BROKEN or (OUT / sub / f.name).exists():
                continue
            d = yaml.safe_load(f.read_text())
            emit(d, f.name, OUT / sub / f.name)
            count += 1
    print(f"materialized {count} configs")
    return count


if __name__ == "__main__":
    main()
