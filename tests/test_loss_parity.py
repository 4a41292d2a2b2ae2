"""TAL assigner + detection loss parity vs the reference torch implementation,
with identical converted weights and an identical synthetic batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectrogram_yolov11_tpu.nn.tasks import build_model
from spectrogram_yolov11_tpu.ops.losses import detection_loss
from spectrogram_yolov11_tpu.utils.torch_compat import load_state_into_variables, torch_state_to_variables

torch = pytest.importorskip("torch")

IMGSZ = 96
NC = 8


def _synth_batch(rng, b=2, max_gt=12):
    """Random images + GT boxes, both torch-format (flat) and ours (padded)."""
    imgs = rng.uniform(0, 1, (b, 3, IMGSZ, IMGSZ)).astype(np.float32)
    n_per = [5, 3]
    cls_pad = np.zeros((b, max_gt), np.int32)
    box_pad = np.zeros((b, max_gt, 4), np.float32)
    mask = np.zeros((b, max_gt), bool)
    flat_cls, flat_box, flat_idx = [], [], []
    for bi, n in enumerate(n_per):
        c = rng.integers(0, NC, n)
        xy = rng.uniform(0.25, 0.75, (n, 2))
        wh = rng.uniform(0.1, 0.4, (n, 2))
        bx = np.concatenate([xy, wh], -1).astype(np.float32)
        cls_pad[bi, :n] = c
        box_pad[bi, :n] = bx
        mask[bi, :n] = True
        flat_cls.append(c)
        flat_box.append(bx)
        flat_idx.append(np.full(n, bi))
    return imgs, cls_pad, box_pad, mask, np.concatenate(flat_cls), np.concatenate(flat_box), np.concatenate(flat_idx)


@pytest.fixture(scope="module")
def models():
    from oracle import torch_detection_model

    tm = torch_detection_model("yolo11n.yaml", nc=NC, seed=5)
    from types import SimpleNamespace

    tm.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    jm = build_model({**__import__("spectrogram_yolov11_tpu.nn.tasks", fromlist=["yaml_model_load"]).yaml_model_load("yolo11n.yaml"), "nc": NC}, nc=NC, verbose=False)
    v = jm.init(jax.random.PRNGKey(0))
    state = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    v = load_state_into_variables(v, torch_state_to_variables(state), strict=True)
    return tm, jm, v


def test_detection_loss_parity(models):
    tm, jm, v = models
    rng = np.random.default_rng(11)
    imgs, cls_pad, box_pad, mask, fc, fb, fi = _synth_batch(rng)

    batch_t = {
        "img": torch.from_numpy(imgs),
        "cls": torch.from_numpy(fc.reshape(-1, 1).astype(np.float32)),
        "bboxes": torch.from_numpy(fb),
        "batch_idx": torch.from_numpy(fi.astype(np.float32)),
    }
    tm.train()
    for mod in tm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.eval()
    t_total, t_items = tm.loss(batch_t)
    t_total = float(t_total.detach())
    t_items = t_items.detach().numpy()

    # torch side ran with BN in eval (running stats); match that here
    feats = jm.apply(v, jnp.asarray(imgs.transpose(0, 2, 3, 1)), train=False)
    j_total, j_items = detection_loss(
        feats, jnp.asarray(cls_pad), jnp.asarray(box_pad), jnp.asarray(mask),
        nc=NC, imgsz=IMGSZ, strides=tuple(float(s) for s in jm.stride),
    )
    np.testing.assert_allclose(np.asarray(j_items), t_items, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(j_total), t_total, rtol=2e-3)


def test_loss_gradients_finite(models):
    _, jm, v = models
    rng = np.random.default_rng(3)
    imgs, cls_pad, box_pad, mask, *_ = _synth_batch(rng)

    def loss_fn(params):
        feats, _ = jm.graph.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            jnp.asarray(imgs.transpose(0, 2, 3, 1)), train=True, mutable=["batch_stats"],
        )[0], None
        total, _ = detection_loss(
            feats, jnp.asarray(cls_pad), jnp.asarray(box_pad), jnp.asarray(mask),
            nc=NC, imgsz=IMGSZ, strides=tuple(float(s) for s in jm.stride),
        )
        return total

    g = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    gn = float(sum(jnp.sum(l**2) for l in leaves) ** 0.5)
    assert gn > 0, "zero gradient"


def test_keypoint_loss_parity_17kpt():
    """OKS keypoint-location loss vs reference KeypointLoss with OKS_SIGMA
    (loss.py:155-170, :471) — advisor flagged the doubled sigmas in round 1."""
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.loss import KeypointLoss
    from ultralytics.utils.metrics import OKS_SIGMA as OKS

    from spectrogram_yolov11_tpu.ops.losses import keypoint_loss_terms
    from spectrogram_yolov11_tpu.ops.metrics import OKS_SIGMA

    np.testing.assert_allclose(OKS_SIGMA, OKS)
    rng = np.random.default_rng(11)
    n, nk = 13, 17
    pred = rng.uniform(0, 20, (n, nk, 3)).astype(np.float32)
    gt = rng.uniform(0, 20, (n, nk, 3)).astype(np.float32)
    gt[..., 2] = rng.integers(0, 3, (n, nk))  # visibility 0/1/2
    area = rng.uniform(4, 100, (n, 1)).astype(np.float32)

    kpt_mask = gt[..., 2] != 0
    crit = KeypointLoss(sigmas=torch.from_numpy(OKS).float())
    t_loss = float(
        crit(torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(kpt_mask), torch.from_numpy(area))
    )

    terms = keypoint_loss_terms(
        jnp.asarray(pred[..., :2]), jnp.asarray(gt[..., :2]), jnp.asarray(kpt_mask, jnp.float32),
        jnp.asarray(area), jnp.asarray(OKS_SIGMA, jnp.float32),
    )
    j_loss = float(terms.mean())
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5)


def test_varifocal_focal_parity():
    """Varifocal/Focal losses match the reference torch implementations
    (reference utils/loss.py:16 VarifocalLoss, :40 FocalLoss)."""
    import numpy as np
    import torch
    from oracle import load_reference

    load_reference()
    from ultralytics.utils.loss import FocalLoss, VarifocalLoss

    from spectrogram_yolov11_tpu.ops.losses import focal_loss, varifocal_loss

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 64, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (4, 64, 3)).astype(np.float32)
    label = (rng.uniform(size=(4, 64, 3)) > 0.8).astype(np.float32)

    ref_v = VarifocalLoss.forward(torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(label))
    ours_v = varifocal_loss(pred, gt, label)
    np.testing.assert_allclose(float(ours_v), float(ref_v), rtol=1e-5)

    ref_f = FocalLoss.forward(torch.from_numpy(pred), torch.from_numpy(label))
    ours_f = focal_loss(pred, label)
    np.testing.assert_allclose(float(ours_f), float(ref_f), rtol=1e-5)
