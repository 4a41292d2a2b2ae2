"""On-device augmentation (ops/device_augment.py) vs the host cv2 pipeline.

The device path must be a drop-in replacement for TrainTransform's image
stages: with the same rng seed, labels are BIT-IDENTICAL (both modes run the
same label math in the same rng draw order) and the assembled image matches
cv2 to interpolation rounding (cv2 warps in 5-bit fixed point and converts
HSV in integer arithmetic; the device computes the same formulas in f32).

Reference behavior being reproduced on-TPU:
/root/reference/ultralytics/data/augment.py Mosaic:490,
RandomPerspective:952, RandomHSV:1303, RandomFlip:1383.
"""

from types import SimpleNamespace

import cv2
import numpy as np
import pytest

from spectrogram_yolov11_tpu.data.augment import TrainTransform
from spectrogram_yolov11_tpu.ops.device_augment import augment_batch

S = 96


class _FakeDS:
    """Tiny in-memory detect dataset with ragged source sizes."""

    def __init__(self, n=8):
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(n):
            h, w = int(rng.integers(60, 140)), int(rng.integers(60, 140))
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            nb = int(rng.integers(1, 5))
            cx, cy = rng.uniform(0.3, 0.7, nb), rng.uniform(0.3, 0.7, nb)
            bw, bh = rng.uniform(0.1, 0.3, nb), rng.uniform(0.1, 0.3, nb)
            b = np.stack([(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h], 1)
            self.items.append((img, b.astype(np.float32), rng.integers(0, 2, nb).astype(np.int32)))

    def __len__(self):
        return len(self.items)

    def load_sample(self, i, square_to=None):
        img, b, c = self.items[i]
        h0, w0 = img.shape[:2]
        if square_to:
            r = square_to / max(h0, w0)
            if r != 1:
                img = cv2.resize(img, (min(int(w0 * r), square_to), min(int(h0 * r), square_to)),
                                 interpolation=cv2.INTER_LINEAR)
                b = b * r
        return {"img": img, "cls": c.copy(), "bboxes": b.copy(), "ori_shape": (h0, w0)}


def _hyp(**kw):
    base = dict(mosaic=1.0, mixup=0.0, copy_paste=0.0, degrees=10.0, translate=0.1, scale=0.5,
                shear=2.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, fliplr=0.5, flipud=0.5)
    base.update(kw)
    return SimpleNamespace(**base)


def _run_pair(hyp, seeds=range(6), close=False, separable=False):
    ds = _FakeDS()
    t_host = TrainTransform(ds, S, hyp, max_gt=32)
    t_dev = TrainTransform(ds, S, hyp, max_gt=32, device_mode=True)
    assert t_dev.device_mode
    if close:
        t_host.close_mosaic()
        t_dev.close_mosaic()
    diffs = []
    for seed in seeds:
        oh = t_host(seed % len(ds), np.random.default_rng(seed))
        od = t_dev(seed % len(ds), np.random.default_rng(seed))
        for k in ("cls", "bboxes", "mask_gt"):
            assert np.array_equal(oh[k], od[k]), f"label {k} mismatch at seed {seed}"
        assert "img" not in od and od["aug_src"].shape == (4, S, S, 3)
        img_dev = np.asarray(augment_batch(
            od["aug_src"][None], od["aug_regions"][None], od["aug_pads"][None],
            od["aug_inv"][None], od["aug_hsv"][None], separable=separable))[0]
        assert img_dev.shape == (S, S, 3)
        diffs.append(np.abs(oh["img"].astype(np.float32) - img_dev))
    return diffs


def test_warp_only_parity_tight():
    """HSV off: pure mosaic+warp+flips — bounded by cv2's 5-bit bilinear."""
    diffs = _run_pair(_hyp(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0))
    for d in diffs:
        assert d.max() <= 4.0
        assert d.mean() < 0.5


def test_full_pipeline_parity():
    """HSV on: hue quantization makes rare per-pixel outliers, nothing more."""
    for d in _run_pair(_hyp()):
        assert d.mean() < 1.0
        assert (d > 3).mean() < 0.01
        assert d.max() <= 48  # isolated hue-boundary pixels


def test_perspective_path():
    for d in _run_pair(_hyp(perspective=0.0005)):
        assert (d > 3).mean() < 0.01


def test_closed_mosaic_single_tile():
    """close_mosaic: letterbox single-tile path, same program shapes."""
    for d in _run_pair(_hyp(degrees=0.0, shear=0.0, flipud=0.0), close=True):
        assert d.mean() < 1.0
        assert (d > 3).mean() < 0.01


def test_batched_jit_shapes():
    import jax

    ds = _FakeDS()
    t_dev = TrainTransform(ds, S, _hyp(), max_gt=32, device_mode=True)
    outs = [t_dev(i % len(ds), np.random.default_rng(i)) for i in range(4)]
    batch = {k: np.stack([o[k] for o in outs]) for k in outs[0]}
    fn = jax.jit(augment_batch)
    img = fn(batch["aug_src"], batch["aug_regions"], batch["aug_pads"],
             batch["aug_inv"], batch["aug_hsv"])
    img = np.asarray(img)
    assert img.shape == (4, S, S, 3) and img.dtype == np.float32
    assert img.min() >= 0 and img.max() <= 255
    assert np.array_equal(img, np.round(img))  # integer-valued (u8-compatible)


def _sep_hyp(**kw):
    """Default-hyp warp family: degrees = shear = perspective = 0 (the
    reference's own defaults) — the separable TPU-fast path applies."""
    return _hyp(degrees=0.0, shear=0.0, perspective=0.0, **kw)


def test_separable_fast_path_parity():
    """Separable sampler (1-D axis gathers) vs the host cv2 pipeline."""
    for d in _run_pair(_sep_hyp(), separable=True):
        assert d.mean() < 1.0
        assert (d > 3).mean() < 0.01


def test_separable_warp_only_tight():
    # cv2's 5-bit fixed-point taps allow ~4 levels vs exact bilinear; the
    # Dekker-split MXU path is f32-exact so no extra allowance is needed
    diffs = _run_pair(_sep_hyp(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0), separable=True)
    for d in diffs:
        assert d.max() <= 4.0
        assert d.mean() < 0.5


def test_separable_gather_matches_general_exactly():
    """On separable inputs the gather formulation and the general path are
    the same math — bit-identical (both round to integer values)."""
    import jax

    from spectrogram_yolov11_tpu.ops.device_augment import _augment_one_separable_gather

    ds = _FakeDS()
    t_dev = TrainTransform(ds, S, _sep_hyp(), max_gt=32, device_mode=True)
    for seed in range(4):
        od = t_dev(seed % len(ds), np.random.default_rng(seed))
        args = (od["aug_src"][None], od["aug_regions"][None], od["aug_pads"][None],
                od["aug_inv"][None], od["aug_hsv"][None])
        a = np.asarray(jax.vmap(_augment_one_separable_gather)(*args))
        b = np.asarray(augment_batch(*args, separable=False))
        assert np.array_equal(a, b)


def test_separable_matmul_vs_gather_oracle():
    """The production MXU-matmul separable path (Dekker-split bf16 operands,
    exact bilinear to ~1e-2 levels) vs the exact-f32 gather oracle: >99% of
    pixels round identically; the rest land within the f32-accumulation
    noise of a .5 boundary and flip by +-1, which the (neutral) HSV
    roundtrip's hue quantization can stretch to a few levels on isolated
    pixels."""
    import jax

    from spectrogram_yolov11_tpu.ops.device_augment import _augment_one_separable_gather

    ds = _FakeDS()
    t_dev = TrainTransform(ds, S, _sep_hyp(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0),
                           max_gt=32, device_mode=True)
    for seed in range(4):
        od = t_dev(seed % len(ds), np.random.default_rng(seed))
        args = (od["aug_src"][None], od["aug_regions"][None], od["aug_pads"][None],
                od["aug_inv"][None], od["aug_hsv"][None])
        a = np.asarray(augment_batch(*args, separable=True))
        b = np.asarray(jax.vmap(_augment_one_separable_gather)(*args))
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        assert (d > 0).mean() < 0.01
        assert d.max() <= 8.0


def test_separable_closed_mosaic():
    for d in _run_pair(_sep_hyp(flipud=0.0), close=True, separable=True):
        assert d.mean() < 1.0
        assert (d > 3).mean() < 0.01


def test_trainer_separable_flag():
    """BaseTrainer derives the static path choice from the hyps."""
    from spectrogram_yolov11_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides=dict(data="shapes128.yaml", model="yolo11n.yaml",
                                        imgsz=96, save=False, plots=False))
    assert t._aug_separable  # default hyps: degrees=shear=perspective=0
    t2 = DetectionTrainer(overrides=dict(data="shapes128.yaml", model="yolo11n.yaml",
                                         imgsz=96, save=False, plots=False, degrees=10.0))
    assert not t2._aug_separable


def test_fallback_when_mixup():
    """Host-only stages force a clean fallback to host augmentation."""
    ds = _FakeDS()
    t = TrainTransform(ds, S, _hyp(mixup=0.5), max_gt=32, device_mode=True)
    assert not t.device_mode
    out = t(0, np.random.default_rng(0))
    assert "img" in out and "aug_src" not in out


@pytest.mark.slow
def test_train_smoke_device_augment(tmp_path):
    """Full trainer loop with device_augment=True: the augmentation runs
    inside the jitted step (no "img" key ever reaches the device)."""
    from spectrogram_yolov11_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides=dict(
        data="shapes128.yaml", model="yolo11n.yaml", imgsz=96, batch=4, nbs=4,
        epochs=1, workers=0, fraction=0.1, val=True, save=True,
        project=str(tmp_path), name="devaug", exist_ok=True,
        close_mosaic=0, device_augment=True, plots=False,
    ))
    t.train()
    assert np.isfinite(list(t.label_loss.values())).all()
    assert np.isfinite(list(t.metrics.values())).all()


class _FakeDSTask(_FakeDS):
    """Adds polygon segments or keypoints per box for segment/pose parity."""

    def __init__(self, kind, n=8):
        super().__init__(n)
        self.kind = kind

    def load_sample(self, i, square_to=None):
        s = super().load_sample(i, square_to)
        b = s["bboxes"]
        if self.kind == "segment":
            # one 4-point polygon per box (slightly inset)
            polys = []
            for x1, y1, x2, y2 in b:
                dx, dy = (x2 - x1) * 0.1, (y2 - y1) * 0.1
                polys.append(np.asarray([[x1 + dx, y1 + dy], [x2 - dx, y1 + dy],
                                         [x2 - dx, y2 - dy], [x1 + dx, y2 - dy]], np.float32))
            s["segments"] = polys
        else:  # pose: 3 visible keypoints per box
            n = len(b)
            kx = np.stack([b[:, 0], (b[:, 0] + b[:, 2]) / 2, b[:, 2]], 1)
            ky = np.stack([b[:, 1], (b[:, 1] + b[:, 3]) / 2, b[:, 3]], 1)
            s["keypoints"] = np.stack([kx, ky, np.ones_like(kx) * 2.0], -1).astype(np.float32)
        return s


@pytest.mark.parametrize("kind", ["segment", "pose"])
def test_device_mode_segment_pose_labels(kind):
    """device_augment label parity extends beyond detect: masks / keypoints
    are host label math and must be bit-identical in both modes."""
    hyp = _hyp()
    kw = dict(task=kind, mask_ratio=4) if kind == "segment" else \
         dict(task=kind, kpt_shape=(3, 3), flip_idx=[0, 1, 2])
    ds = _FakeDSTask(kind)
    t_host = TrainTransform(ds, S, hyp, max_gt=32, **kw)
    t_dev = TrainTransform(ds, S, hyp, max_gt=32, device_mode=True, **kw)
    assert t_dev.device_mode
    keys = ("cls", "bboxes", "mask_gt") + (("masks",) if kind == "segment" else ("keypoints",))
    for seed in range(6):
        oh = t_host(seed % len(ds), np.random.default_rng(seed))
        od = t_dev(seed % len(ds), np.random.default_rng(seed))
        for k in keys:
            assert np.array_equal(oh[k], od[k]), f"{k} mismatch at seed {seed}"
        assert "img" not in od and od["aug_src"].shape == (4, S, S, 3)


def test_device_augment_auto_resolution():
    """device_augment=auto (the default) resolves to on for separable hyps
    (degrees=shear=perspective=0, the reference defaults) and to off when the
    warp is non-separable or multi_scale is set."""
    from spectrogram_yolov11_tpu.cfg import get_cfg
    from spectrogram_yolov11_tpu.engine.trainer import BaseTrainer
    from spectrogram_yolov11_tpu.utils import DEFAULT_CFG

    assert get_cfg(DEFAULT_CFG).device_augment == "auto"  # shipping default

    t = BaseTrainer.__new__(BaseTrainer)
    t.args = get_cfg(DEFAULT_CFG)
    assert t._resolve_device_augment() is True
    t.args = get_cfg(DEFAULT_CFG, dict(degrees=10.0))
    assert t._resolve_device_augment() is False
    t.args = get_cfg(DEFAULT_CFG, dict(multi_scale=True))
    assert t._resolve_device_augment() is False
    t.args = get_cfg(DEFAULT_CFG, dict(device_augment=False))
    assert t._resolve_device_augment() is False
    t.args = get_cfg(DEFAULT_CFG, dict(device_augment=True, degrees=10.0))
    assert t._resolve_device_augment() is True  # explicit True wins (general sampler)
