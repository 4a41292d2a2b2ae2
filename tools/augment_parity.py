"""Pinned-draw augmentation parity: reference v8 train pipeline vs ours.

Feeds FOUR identical synthetic BGR images + boxes through
(a) the reference Mosaic -> RandomPerspective -> RandomHSV -> RandomFlip ->
    Format chain (torch, tests/oracle.py stubs), and
(b) our TrainTransform stages,
with every random draw pinned to the same scripted fractions on both sides,
then compares the output image pixels and the final normalized xywh labels.

This isolates the *training data* half of convergence parity: if the pixels
and labels agree draw-for-draw, a train-quality gap cannot come from the
augmentation pipeline.

Usage: python tools/augment_parity.py  (CPU; prints PASS/FAIL per field)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

S = 160  # imgsz
# scripted fractions, consumed in draw order
FR = {
    "yc": 0.55, "xc": 0.45,
    "px": 0.5, "py": 0.5,  # perspective=0 -> value irrelevant, draw consumed
    "deg": 0.5,  # degrees=0
    "scale": 0.8,  # s = 0.5 + 0.8*1.0 = 1.3
    "shx": 0.5, "shy": 0.5,  # shear=0
    "tx": 0.7,  # (0.4 + 0.7*0.2) * w
    "ty": 0.3,
    "hsv": (0.2, 0.9, 0.6),
    "fliplr": 0.3,  # < 0.5 -> flip
}


def make_inputs():
    """Four BGR images (long side == S, mixed aspects) + pixel-xyxy boxes."""
    rng = np.random.default_rng(7)
    sizes = [(S, S), (120, S), (S, 120), (100, S)]  # (h, w)
    samples = []
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(30, 220, (h, w, 3), np.uint8)
        boxes = []
        for _ in range(3):
            x1 = rng.uniform(0, w * 0.6)
            y1 = rng.uniform(0, h * 0.6)
            x2 = x1 + rng.uniform(12, w * 0.35)
            y2 = y1 + rng.uniform(12, h * 0.35)
            boxes.append([x1, y1, min(x2, w - 1), min(y2, h - 1)])
            img[int(y1):int(y2), int(x1):int(x2)] = rng.integers(0, 255, 3, np.uint8)
        cls = np.arange(3) % 2
        samples.append({"img": img, "boxes": np.asarray(boxes, np.float32), "cls": cls})
    return samples


def run_reference(samples, mosaic=True):
    from oracle import load_reference

    load_reference()
    import random as pyrandom

    from ultralytics.data.augment import (Format, LetterBox, Mosaic, RandomFlip, RandomHSV,
                                          RandomPerspective)
    from ultralytics.utils.instance import Instances

    # draw order: [yc, xc] | px, py, deg, scale, shx, shy, tx, ty | flip(random)
    uq = ([FR["yc"], FR["xc"]] if mosaic else []) + [
        FR["px"], FR["py"], FR["deg"], FR["scale"],
        FR["shx"], FR["shy"], FR["tx"], FR["ty"],
        0.5]  # Format._format_img bgr gate (bgr=0.0 -> always BGR->RGB)
    rq = [FR["fliplr"]]

    real_uniform, real_random = pyrandom.uniform, pyrandom.random
    real_np_uniform = np.random.uniform
    pyrandom.uniform = lambda a, b: a + (b - a) * uq.pop(0)
    pyrandom.random = lambda: rq.pop(0)
    np.random.uniform = lambda lo, hi, size=None: (
        lo + (hi - lo) * np.asarray(FR["hsv"]) if size == 3 else real_np_uniform(lo, hi, size)
    )
    try:
        def lab(s):
            h, w = s["img"].shape[:2]
            xywh = np.stack([
                (s["boxes"][:, 0] + s["boxes"][:, 2]) / 2 / w,
                (s["boxes"][:, 1] + s["boxes"][:, 3]) / 2 / h,
                (s["boxes"][:, 2] - s["boxes"][:, 0]) / w,
                (s["boxes"][:, 3] - s["boxes"][:, 1]) / h,
            ], 1).astype(np.float32)
            return {
                "img": s["img"].copy(),
                "cls": s["cls"].reshape(-1, 1).astype(np.float32),
                "im_file": "synthetic.png",
                "ori_shape": (h, w),
                "resized_shape": (h, w),
                "instances": Instances(xywh, segments=np.zeros((0, 1000, 2), np.float32),
                                       bbox_format="xywh", normalized=True),
            }

        if mosaic:
            labels = lab(samples[0])
            labels["mix_labels"] = [lab(s) for s in samples[1:]]
            m = Mosaic(dataset=None, imgsz=S, p=1.0, n=4)
            out = m._mosaic4(labels)
            out.pop("mix_labels", None)
            border = m.border
        else:
            # close_mosaic path: RandomPerspective.pre_transform = LetterBox
            # (reference augment.py v8_transforms)
            out = LetterBox(new_shape=(S, S))(labels=lab(samples[0]))
            border = (0, 0)
        rp = RandomPerspective(degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
                               perspective=0.0, border=border)
        out = rp(out)
        RandomHSV(hgain=0.015, sgain=0.7, vgain=0.4)(out)
        out = RandomFlip(p=0.5, direction="horizontal")(out)
        fmt = Format(bbox_format="xywh", normalize=True, return_mask=False,
                     return_keypoint=False, batch_idx=True, bgr=0.0)
        final = fmt(out)
        img = final["img"].numpy()  # CHW RGB uint8
        img = np.ascontiguousarray(img.transpose(1, 2, 0))
        boxes = final["bboxes"].numpy()
        cls = final["cls"].numpy().ravel()
        return img, boxes, cls
    finally:
        pyrandom.uniform, pyrandom.random = real_uniform, real_random
        np.random.uniform = real_np_uniform


class FakeRng:
    """Scripted stand-in for np.random.Generator in our pipeline's draw order."""

    def __init__(self, mosaic=True):
        # mosaic gate (random), partner idxs (integers), yc, xc | warp x8 | hsv x3 | fliplr
        self.uq = ([FR["yc"], FR["xc"]] if mosaic else []) + [
            FR["px"], FR["py"], FR["deg"], FR["scale"],
            FR["shx"], FR["shy"], FR["tx"], FR["ty"]]
        # mosaic gate draw only when mosaic is enabled (close_mosaic
        # short-circuits `mosaic_enabled and rng.random() < p`)
        self.rq = ([0.0] if mosaic else []) + [FR["fliplr"]]

    def random(self):
        return self.rq.pop(0)

    def integers(self, lo, hi, n=None):
        assert n == 3
        return np.asarray([1, 2, 3])

    def uniform(self, lo, hi, size=None):
        if size == 3:
            return lo + (hi - lo) * np.asarray(FR["hsv"])
        return lo + (hi - lo) * self.uq.pop(0)


def run_ours(samples, mosaic=True):
    from types import SimpleNamespace

    from spectrogram_yolov11_tpu.data.augment import TrainTransform

    class DS:
        def __len__(self):
            return 4

        def load_sample(self, i, square_to=None):
            s = samples[i]
            return {"img": s["img"].copy(), "cls": s["cls"].copy(),
                    "bboxes": s["boxes"].copy(), "ori_shape": s["img"].shape[:2]}

    hyp = SimpleNamespace(mosaic=1.0, mixup=0.0, copy_paste=0.0, degrees=0.0,
                          translate=0.1, scale=0.5, shear=0.0, perspective=0.0,
                          hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, fliplr=0.5, flipud=0.0)
    t = TrainTransform(DS(), imgsz=S, hyp=hyp, max_gt=32)
    assert t.albumentations.transform is None, "albumentations active: draw order differs"
    if not mosaic:
        t.close_mosaic()
    out = t(0, FakeRng(mosaic))
    n = int(out["mask_gt"].sum())
    return out["img"], np.concatenate(
        [out["bboxes"][:n]], 0), out["cls"][:n]


def compare(samples, mosaic):
    print(f"--- scenario: {'mosaic' if mosaic else 'letterbox (close_mosaic)'}")
    ref_img, ref_boxes, ref_cls = run_reference(samples, mosaic)
    our_img, our_boxes, our_cls = run_ours(samples, mosaic)

    ok = True
    if ref_img.shape != our_img.shape:
        print(f"FAIL img shape: ref {ref_img.shape} vs ours {our_img.shape}")
        ok = False
    else:
        diff = (ref_img.astype(np.int32) - our_img.astype(np.int32))
        frac = (np.abs(diff) > 2).mean()
        print(f"img: max|d|={np.abs(diff).max()} frac(|d|>2)={frac:.5f} "
              + ("PASS" if frac < 0.002 else "FAIL"))
        ok &= frac < 0.002

    def key(b, c):
        o = np.lexsort((b[:, 0], b[:, 1]))
        return b[o], c[o]

    rb, rc = key(ref_boxes, ref_cls)
    ob, oc = key(our_boxes, our_cls)
    print(f"n boxes: ref {len(rb)} ours {len(ob)}")
    if len(rb) == len(ob):
        d = np.abs(rb - ob).max() if len(rb) else 0.0
        print(f"boxes: max|d|={d:.6f} " + ("PASS" if d < 1e-4 else "FAIL"))
        print(f"cls equal: {bool((rc.astype(int) == oc.astype(int)).all())}")
        ok &= d < 1e-4 and (rc.astype(int) == oc.astype(int)).all()
    else:
        ok = False
        print("FAIL box count mismatch")
        print("ref:", rb)
        print("ours:", ob)
    return ok


def main():
    samples = make_inputs()
    ok = compare(samples, mosaic=True)
    ok &= compare(samples, mosaic=False)
    print("AUGMENT_PARITY", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
