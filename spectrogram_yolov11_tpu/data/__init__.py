from .dataset import (  # noqa: F401
    ClassificationDataset,
    GroundingDataset,
    HUBDatasetStats,
    YOLOConcatDataset,
    YOLODataset,
    YOLOMultiModalDataset,
    check_cls_dataset,
    check_det_dataset,
)
from .build import DataLoader, build_dataloader, collate  # noqa: F401
from .loaders import (  # noqa: F401
    LoadImagesAndVideos,
    LoadIQCaptures,
    LoadPilAndNumpy,
    LoadScreenshots,
    LoadStreams,
    LoadTensor,
    load_inference_source,
)
