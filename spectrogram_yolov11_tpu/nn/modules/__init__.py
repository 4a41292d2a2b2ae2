"""Module zoo registry (mirrors the import surface of the reference
/root/reference/ultralytics/nn/modules/__init__.py restricted to what the
YAML graph compiler can instantiate)."""

from .conv import (
    CBAM,
    ChannelAttention,
    Concat,
    Conv,
    ConvE,
    ConvGN,
    ConvTranspose,
    DWConv,
    Focus,
    GhostConv,
    Index,
    LightConv,
    MaxPool2d,
    RepConv,
    SpatialAttention,
    Upsample,
    autopad,
)
from .block import (
    C1,
    C2,
    C2PSA,
    C2f,
    C2fCIB,
    C2fPSA,
    C3,
    C3k,
    C3k2,
    CIB,
    SPP,
    SPPF,
    Bottleneck,
    BottleneckCSP,
    GhostBottleneck,
    HGBlock,
    HGStem,
    PSA,
    PSABlock,
    Attention,
    Proto,
    RepC3,
    RepVGGDW,
    SCDown,
    dfl_decode,
)
from .head import OBB, Classify, Detect, Pose, Segment, detect_bias_init

__all__ = [k for k in dir() if not k.startswith("_")]
