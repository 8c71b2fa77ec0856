"""Host-side data layer: datasets, pipeline transforms, batched loader.

Redesign of `mmdet/datasets/`: numpy/cv2 pipeline on the host, static
shape buckets so device-side jit caches stay bounded, gt padded to fixed
counts with validity masks.
"""

from .transforms import (
    LoadImageFromFile, LoadAnnotations, Resize, PanoResize, RandomFlip,
    Normalize, Pad, PanoStretch, RollAug, PanoCheck, BasketBallExpand,
    Compose,
)
from .datasets import (CocoStyleDataset, CocoDataset, StreetDataset,
                       Indoor360Dataset, VOCDataset)
from .wrappers import RepeatDataset, ConcatDataset, ClassBalancedDataset
from .loader import DetDataLoader
from .builder import (DATASETS, PIPELINES, build_dataset, build_dataloader,
                      replace_ImageToTensor, get_loading_pipeline)

__all__ = [
    "LoadImageFromFile", "LoadAnnotations", "Resize", "PanoResize",
    "RandomFlip", "Normalize", "Pad", "PanoStretch", "RollAug", "PanoCheck",
    "BasketBallExpand",
    "Compose", "CocoStyleDataset", "CocoDataset", "StreetDataset",
    "Indoor360Dataset", "VOCDataset", "RepeatDataset", "ConcatDataset",
    "ClassBalancedDataset", "DetDataLoader",
    "DATASETS", "PIPELINES", "build_dataset", "build_dataloader",
    "replace_ImageToTensor", "get_loading_pipeline",
]
