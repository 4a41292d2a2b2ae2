from . import modules  # noqa: F401
from .tasks import (  # noqa: F401
    BaseModel,
    ClassificationModel,
    DetectionModel,
    OBBModel,
    PoseModel,
    SegmentationModel,
    YOLOGraph,
    build_model,
    guess_model_task,
    parse_model,
    yaml_model_load,
)
