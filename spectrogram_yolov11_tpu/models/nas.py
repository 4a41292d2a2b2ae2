"""YOLO-NAS (reference: /root/reference/ultralytics/models/nas/).

The reference NAS class is a wrapper that imports super-gradients at runtime
and downloads its pretrained torch checkpoints (model.py:53-62) — no YAML
architecture exists there at all. Neither the download nor the torch runtime
is available in this zero-egress TPU build, so this framework goes further
than the reference: the yolo_nas_s architecture itself is implemented
natively (nn/modules/nas.py: QARepVGG / NASStage / NASCSP + the
transposed-conv PAN neck, cfg/models/nas/yolo_nas_s.yaml), making NAS a
real, trainable model family here:

- ``NAS('yolo_nas_s')`` builds the native architecture (random init — train
  it like any detector; super-gradients pretrained weights remain
  unimportable offline, the documented deviation);
- ``NAS(path.ckpt)`` wraps any framework detection checkpoint with the NAS
  facade, matching the reference's predict/val/info surface;
- ``NAS(x.pt)`` raises the same informative constraint the reference raises
  for unavailable pretrained assets.

Prediction/validation route through the standard detect machinery: the
reference's NASPredictor/NASValidator (predict.py:35, val.py:38) exist only
to re-pack super-gradients' pre-decoded (xyxy, scores) output into the
common NMS layout; our Detect head already emits the framework's standard
raw form, so DetectionPredictor/DetectionValidator apply unchanged.
"""

from __future__ import annotations

import copy
from pathlib import Path


def fuse_nas(model, variables):
    """Re-parameterize a trained NAS model for serving: every QARepVGG's
    three branches + two BNs fold into ONE biased 3x3 conv (exact algebra,
    `nn.modules.nas.fuse_qarepvgg`). Returns (deploy_model, deploy_variables).

    The reference can't offer this at all (its NAS weights live inside
    super-gradients); here it's a pure pytree transform + a graph rebuild
    with `deploy=True` specs. XLA never folds parallel convs, so this is a
    genuine graph simplification, not something compilation already does.
    """
    from spectrogram_yolov11_tpu.nn import modules as M
    from spectrogram_yolov11_tpu.nn.tasks import LayerSpec, YOLOGraph
    from spectrogram_yolov11_tpu.nn.modules.nas import fuse_qarepvgg

    nas_classes = {M.QARepVGG, M.NASStage, M.NASCSP}

    def walk(p, s):
        """Mirror-walk params/batch_stats; fold QARepVGG subtrees."""
        if isinstance(p, dict) and "branch_3x3" in p and "post_bn" in p:
            k, b = fuse_qarepvgg(p, s or {})
            return {"reparam": {"kernel": k, "bias": b}}, None
        if not isinstance(p, dict):
            return p, s
        new_p, new_s = {}, {}
        for key in set(p) | set(s or {}):
            sp, ss = walk(p.get(key), (s or {}).get(key))
            if sp is not None:
                new_p[key] = sp
            if ss is not None and (isinstance(ss, dict) and ss or not isinstance(ss, dict)):
                new_s[key] = ss
        return new_p, (new_s or None)

    params2, stats2 = walk(variables["params"], variables.get("batch_stats", {}))
    deploy_vars = {"params": params2, "batch_stats": stats2 or {}}

    m2 = copy.copy(model)
    m2.specs = [
        LayerSpec(sp.i, sp.f, sp.n, sp.cls, sp.args,
                  {**dict(sp.kwargs), "deploy": True} if sp.cls in nas_classes else dict(sp.kwargs),
                  sp.type)
        for sp in model.specs
    ]
    m2.graph = YOLOGraph(specs=tuple(m2.specs), save=tuple(model.save), dtype=model.dtype)
    return m2, deploy_vars


class NAS:
    """`NAS('yolo_nas_s' | 'model.ckpt')` — YOLO-NAS detection facade
    (reference: models/nas/model.py:26)."""

    def __new__(cls, model: str = "yolo_nas_s"):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        name = str(model)
        suffix = Path(name).suffix
        assert suffix not in {".yaml", ".yml"} or Path(name).stem.startswith("yolo_nas"), (
            "YOLO-NAS models only support the yolo_nas_* architectures."
        )
        if suffix == ".pt":
            raise NotImplementedError(
                "super-gradients pretrained weights are torch-runtime artifacts; this TPU build "
                "builds the architecture natively instead: NAS('yolo_nas_s') then train, or pass "
                "a framework .ckpt."
            )
        if suffix == ".ckpt":
            return YOLO(name, task="detect")
        stem = Path(name).stem
        return YOLO(f"{stem}.yaml", task="detect")
