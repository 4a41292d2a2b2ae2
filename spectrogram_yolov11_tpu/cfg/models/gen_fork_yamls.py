"""Generator for the fork's model-config families.

The reference ships 144 fork YAMLs under cfg/models/11/ that are systematic
edits of the yolo11 skeleton (attention inserted after head/backbone C3k2s,
downsample convs swapped for ghost/max hybrids, SPPF variants, Fusion/BiFPN
necks, C3k2 block swaps — see SURVEY 2.13). Rather than hand-copying each
file, this generator reproduces the families programmatically; run it to
(re)materialize the YAMLs under models/11/fork/.

    python -m spectrogram_yolov11_tpu.cfg.models.gen_fork_yamls
"""

from __future__ import annotations

from pathlib import Path

HEADER = """# Auto-generated fork-family config (gen_fork_yamls.py). Mirrors the
# reference fork's {family} pattern (/root/reference/ultralytics/cfg/models/11/).
nc: {nc}
scales:
  n: [0.50, 0.25, 1024]
  s: [0.50, 0.50, 1024]
  m: [0.50, 1.00, 512]
  l: [1.00, 1.00, 512]
  x: [1.00, 1.50, 512]
"""

BACKBONE = [
    "[-1, 1, {p1}, [64, 3, 2]]",
    "[-1, 1, {p2}, [128, 3, 2]]",
    "[-1, 2, {blk_e}, [256, False, 0.25]]",
    "[-1, 1, {p3}, [256, 3, 2]]",
    "[-1, 2, {blk_e}, [512, False, 0.25]]",
    "[-1, 1, {p4}, [512, 3, 2]]",
    "[-1, 2, {blk_l}, [512, True]]",
    "[-1, 1, {p5}, [1024, 3, 2]]",
    "[-1, 2, {blk_l}, [1024, True]]",
    "[-1, 1, {sppf}, [1024, 5]]",
    "[-1, 2, C2PSA, [1024]]",
]


def _lines(items):
    return "\n".join(f"  - {s}" for s in items)


def backbone(p="Conv", blk="C3k2", sppf="SPPF", att=None):
    rows = [
        s.format(p1="Conv", p2="Conv", p3=p, p4=p, p5=p, blk_e=blk, blk_l=blk, sppf=sppf) for s in BACKBONE
    ]
    if att:
        # insert attention after each backbone C3k2 (indices 2, 4, 6, 8)
        out = []
        for i, r in enumerate(rows):
            out.append(r)
            if i in (2, 4, 6, 8):
                c = {2: 256, 4: 512, 6: 512, 8: 1024}[i]
                out.append(f"[-1, 1, {att}, [{c}]]")
        rows = out
    return rows


def std_head(att=None, backbone_len=11):
    """The yolo11 PAN head, optionally with attention after each C3k2
    (yolo11_HCA pattern); indices auto-shift."""
    b = backbone_len - 1  # index of C2PSA
    p3_skip, p4_skip = 4, 6
    if backbone_len > 11:  # backbone attention shifts skip indices
        # attention inserted after rows 2,4,6,8 -> original index i shifts by #insertions before it
        shift = lambda i: i + sum(1 for j in (2, 4, 6, 8) if j < i or j == i)  # after the block itself
        p3_skip, p4_skip = shift(4), shift(6)
    rows = []
    idx = backbone_len
    def add(r):
        nonlocal idx
        rows.append(r)
        idx += 1
    add("[-1, 1, nn.Upsample, [None, 2, nearest]]")
    add(f"[[-1, {p4_skip}], 1, Concat, [1]]")
    add("[-1, 2, C3k2, [512, False]]")
    p4_head = idx - 1
    if att:
        add(f"[-1, 1, {att}, [512]]")
        p4_head = idx - 1
    add("[-1, 1, nn.Upsample, [None, 2, nearest]]")
    add(f"[[-1, {p3_skip}], 1, Concat, [1]]")
    add("[-1, 2, C3k2, [256, False]]")
    p3_out = idx - 1
    if att:
        add(f"[-1, 1, {att}, [256]]")
        p3_out = idx - 1
    add("[-1, 1, Conv, [256, 3, 2]]")
    add(f"[[-1, {p4_head}], 1, Concat, [1]]")
    add("[-1, 2, C3k2, [512, False]]")
    p4_out = idx - 1
    if att:
        add(f"[-1, 1, {att}, [512]]")
        p4_out = idx - 1
    add("[-1, 1, Conv, [512, 3, 2]]")
    add(f"[[-1, {b}], 1, Concat, [1]]")
    add("[-1, 2, C3k2, [1024, True]]")
    p5_out = idx - 1
    if att:
        add(f"[-1, 1, {att}, [1024]]")
        p5_out = idx - 1
    add(f"[[{p3_out}, {p4_out}, {p5_out}], 1, Detect, [nc]]")
    return rows


def fusion_head(mode_arg="'SChannel'", extra=""):
    """The bifpn/Fusion neck (yolo11_bifpn / yolo11_SChannel_bifpn pattern)."""
    return [
        "[4, 1, Conv, [256]]",    # 11
        "[6, 1, Conv, [256]]",    # 12
        "[10, 1, Conv, [256]]",   # 13
        "[-1, 1, nn.Upsample, [None, 2, nearest]]",      # 14
        f"[[-1, 12], 1, Fusion, [{mode_arg}{extra}]]",   # 15
        "[-1, 2, C3k2, [256, False]]",                   # 16
        "[-1, 1, nn.Upsample, [None, 2, nearest]]",      # 17
        f"[[-1, 11], 1, Fusion, [{mode_arg}{extra}]]",   # 18
        "[-1, 2, C3k2, [256, False]]",                   # 19 P3
        "[-1, 1, Conv, [256, 3, 2]]",                    # 20
        f"[[-1, 16], 1, Fusion, [{mode_arg}{extra}]]",   # 21
        "[-1, 2, C3k2, [256, False]]",                   # 22 P4
        "[-1, 1, Conv, [256, 3, 2]]",                    # 23
        f"[[-1, 13], 1, Fusion, [{mode_arg}{extra}]]",   # 24
        "[-1, 2, C3k2, [256, True]]",                    # 25 P5
        "[[19, 22, 25], 1, Detect, [nc]]",
    ]


def wconcat_head():
    """BiFPN weighted-concat neck (yolo11_WCC_BiFPN pattern)."""
    return [
        "[-1, 1, nn.Upsample, [None, 2, nearest]]",
        "[[-1, 6], 1, BiFPN_WConcat2, [1]]",
        "[-1, 2, C3k2, [512, False]]",   # 13
        "[-1, 1, nn.Upsample, [None, 2, nearest]]",
        "[[-1, 4], 1, BiFPN_WConcat2, [1]]",
        "[-1, 2, C3k2, [256, False]]",   # 16 P3
        "[-1, 1, Conv, [256, 3, 2]]",
        "[[-1, 13, 6], 1, BiFPN_WConcat3, [1]]",
        "[-1, 2, C3k2, [512, False]]",   # 19 P4
        "[-1, 1, Conv, [512, 3, 2]]",
        "[[-1, 10], 1, BiFPN_WConcat2, [1]]",
        "[-1, 2, C3k2, [1024, True]]",   # 22 P5
        "[[16, 19, 22], 1, Detect, [nc]]",
    ]


def generate(out_dir: Path | None = None) -> list:
    out_dir = out_dir or Path(__file__).parent / "11" / "fork"
    out_dir.mkdir(parents=True, exist_ok=True)
    cfgs = {}

    # 1. head-attention family (yolo11_HCA pattern)
    for name, att in [("HCA", "HCoordAtt"), ("CA", "CoordAtt"), ("CBam", "CBAM"),
                      ("AKCBam", "AKCBAM"), ("MaxHCA", "MaxHCoordAtt")]:
        cfgs[f"yolo11_{name}"] = (backbone(), std_head(att=att))

    # 2. backbone-attention family (yolo11_HCA_backbone pattern)
    for name, att in [("HCA_backbone", "HCoordAtt"), ("CA_backbone", "CoordAtt"),
                      ("AKCBam_backbone", "AKCBAM"), ("MaxHCA_backbone", "MaxHCoordAtt")]:
        bb = backbone(att=att)
        cfgs[f"yolo11_{name}"] = (bb, std_head(att=None, backbone_len=len(bb)))

    # 3. combined (yolo11_AKCBam_backbone_HCA pattern)
    bb = backbone(att="AKCBAM")
    cfgs["yolo11_AKCBam_backbone_HCA"] = (bb, std_head(att="HCoordAtt", backbone_len=len(bb)))

    # 4. downsample-replacement family (yolo11_GGSConvHCA pattern)
    for name, ds in [("GGSConv", "GhostMaxConv"), ("GGSConvHCA", "GhostMaxConv"),
                     ("MaxHCAConv", "MaxConvHCA"), ("OMNConv", "ConvOMN"),
                     ("DDWConv", "DDWConv"), ("FilterMaxConv", "FilterMaxConv"),
                     ("GhostConvMax", "GhostConvMax"), ("ConvHCA", "ConvHCA")]:
        cfgs[f"yolo11_{name}"] = (backbone(p=ds), std_head())

    # 5. SPPF variants
    cfgs["yolo11_MixSPPF"] = (backbone(sppf="Mix_SPPF"), std_head())
    cfgs["yolo11_SAPF"] = (backbone(sppf="SAPF"), std_head())

    # 6. Fusion / BiFPN necks
    cfgs["yolo11_bifpn"] = (backbone(), fusion_head("'SChannel'"))
    cfgs["yolo11_SChannel_bifpn"] = (backbone(), fusion_head("'SChannel'", ", 256"))
    cfgs["yolo11_WCC_BiFPN"] = (backbone(), wconcat_head())

    # 7. block-replacement family (yolo11_SMSC pattern: late stages swapped)
    for name, blk in [("SMSC", "C3MSCk2"), ("GC_HCA_backbone", "C3k2GC")]:
        bb = backbone()
        bb[6] = bb[6].replace("C3k2", blk)
        bb[8] = bb[8].replace("C3k2", blk)
        cfgs[f"yolo11_{name}"] = (bb, std_head())

    # 8. ghost variants
    cfgs["yolo11_GhostHCA"] = (backbone(p="GhostConvHCA"), std_head())

    written = []
    for name, (bb, head) in cfgs.items():
        body = HEADER.format(family=name, nc=80) + "backbone:\n" + _lines(bb) + "\nhead:\n" + _lines(head) + "\n"
        p = out_dir / f"{name}.yaml"
        p.write_text(body)
        written.append(p)

    # 9. the spectrogram flagship: fork's best ideas composed for LTE/RF (nc=2)
    spec = HEADER.format(family="spectrogram flagship (HCA head, nc=2)", nc=2)
    spec += "backbone:\n" + _lines(backbone()) + "\nhead:\n" + _lines(std_head(att="HCoordAtt")) + "\n"
    p = out_dir.parent / "spectrogram_yolo11.yaml"
    p.write_text(spec)
    written.append(p)
    return written


if __name__ == "__main__":
    for p in generate():
        print(p)
