"""Test-only oracle: import the reference torch implementation (read-only at
/root/reference) to validate numerics of our TPU-native build against it.

The runtime image lacks torchvision, which the reference imports eagerly; we
install a minimal stub (version metadata + ops.nms in pure torch) before
importing. This module is used ONLY by tests — the framework itself has no
torch dependency at runtime (torch is optional for .pt checkpoint import).
"""

from __future__ import annotations

import importlib.metadata
import sys
import types

import numpy as np

_REFERENCE = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.23.0"
    ops = types.ModuleType("torchvision.ops")

    def nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou_threshold: float) -> "torch.Tensor":
        """Pure-torch greedy NMS (same semantics as torchvision.ops.nms).

        Iterates only over KEPT boxes (argmax of still-alive scores), so cost
        is O(n_kept * n) — dense 10k-candidate val scenes stay inside the
        reference's NMS time limit (utils/ops.py:254)."""
        n = len(boxes)
        areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
        # tie-break like the sort-based original: earlier index wins on equal
        # scores (argmax returns the first maximal element)
        live_scores = scores.double() - torch.arange(n, dtype=torch.float64) * 1e-12
        alive = torch.ones(n, dtype=torch.bool)
        keep = []
        neg = torch.tensor(float("-inf"), dtype=torch.float64)
        while bool(alive.any()):
            oi = int(torch.where(alive, live_scores, neg).argmax())
            keep.append(oi)
            xx1 = torch.maximum(boxes[oi, 0], boxes[:, 0])
            yy1 = torch.maximum(boxes[oi, 1], boxes[:, 1])
            xx2 = torch.minimum(boxes[oi, 2], boxes[:, 2])
            yy2 = torch.minimum(boxes[oi, 3], boxes[:, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[oi] + areas - inter + 1e-7)
            alive &= ~(iou > iou_threshold)
            alive[oi] = False
        return torch.tensor(keep, dtype=torch.long)

    ops.nms = nms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops

    if "thop" not in sys.modules:  # FLOPs profiler, only used for model.info()
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0.0, 0.0)
        sys.modules["thop"] = thop

    if "timm" not in sys.modules:  # used by a few fork modules (GlobalContext etc.)
        import torch.nn as tnn

        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.layers")
        create_act = types.ModuleType("timm.layers.create_act")
        _ACTS = {"sigmoid": tnn.Sigmoid, "relu": tnn.ReLU, "silu": tnn.SiLU, "gelu": tnn.GELU, "tanh": tnn.Tanh}

        def get_act_layer(name):
            return _ACTS[name] if isinstance(name, str) else name

        def create_act_layer(name, **kwargs):
            cls = get_act_layer(name)
            return cls() if cls is not None else tnn.Identity()

        create_act.create_act_layer = create_act_layer
        create_act.get_act_layer = get_act_layer
        helpers = types.ModuleType("timm.layers.helpers")
        helpers.make_divisible = lambda v, divisor=8, min_value=None, round_limit=0.9: max(
            min_value or divisor, int(v + divisor / 2) // divisor * divisor
        )
        mlp = types.ModuleType("timm.layers.mlp")

        class ConvMlp(tnn.Module):
            def __init__(self, in_features, hidden_features=None, out_features=None, act_layer=tnn.ReLU, norm_layer=None, bias=True, drop=0.0):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = tnn.Conv2d(in_features, hidden_features, 1, bias=bias)
                self.norm = norm_layer(hidden_features) if norm_layer else tnn.Identity()
                self.act = act_layer()
                self.fc2 = tnn.Conv2d(hidden_features, out_features, 1, bias=bias)

            def forward(self, x):
                return self.fc2(self.act(self.norm(self.fc1(x))))

        mlp.ConvMlp = ConvMlp
        norm = types.ModuleType("timm.layers.norm")

        class LayerNorm2d(tnn.LayerNorm):
            def __init__(self, num_channels, **kwargs):
                super().__init__(num_channels, **kwargs)

            def forward(self, x):
                return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

        norm.LayerNorm2d = LayerNorm2d
        models = types.ModuleType("timm.models")
        models_layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        models_layers.DropPath = DropPath
        layers.create_act = create_act
        layers.helpers = helpers
        layers.mlp = mlp
        layers.norm = norm
        timm.layers = layers
        timm.models = models
        models.layers = models_layers
        for name, mod in {
            "timm": timm, "timm.layers": layers, "timm.layers.create_act": create_act,
            "timm.layers.helpers": helpers, "timm.layers.mlp": mlp, "timm.layers.norm": norm,
            "timm.models": models, "timm.models.layers": models_layers,
        }.items():
            sys.modules[name] = mod

    _orig_version = importlib.metadata.version

    def _version(name):
        if name == "torchvision":
            return tv.__version__
        return _orig_version(name)

    importlib.metadata.version = _version


def load_reference():
    """Import the reference ultralytics package (stubbed deps) and return it."""
    import os

    os.environ.setdefault("YOLO_VERBOSE", "false")
    _install_torchvision_stub()
    if _REFERENCE not in sys.path:
        sys.path.insert(0, _REFERENCE)
    import ultralytics  # noqa

    return ultralytics


def torch_detection_model(cfg: str = "yolo11n.yaml", nc: int = 80, seed: int = 0):
    """Build the reference DetectionModel with seeded init, in eval mode."""
    import torch

    load_reference()
    from ultralytics.nn.tasks import DetectionModel

    torch.manual_seed(seed)
    m = DetectionModel(cfg, ch=3, nc=nc, verbose=False)
    m.eval()
    return m


def torch_forward_raw(model, x_nchw: np.ndarray) -> list[np.ndarray]:
    """Run the reference model in TRAIN-shape mode (raw per-level maps), eval BN."""
    import torch

    model.eval()
    with torch.no_grad():
        # training=True path returns raw maps, but keeps BN in eval because we
        # only flipped the head's branch; instead call with model.train() minus BN:
        prev = model.training
        model.train()
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.eval()
        out = model(torch.from_numpy(x_nchw))
        model.train(prev)
    return [o.detach().numpy() for o in out]


def torch_state_dict(model) -> dict[str, np.ndarray]:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
