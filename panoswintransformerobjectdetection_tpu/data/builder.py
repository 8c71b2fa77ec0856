"""Config-dict builders for datasets and pipelines (PIPELINES registry role)."""

from typing import Sequence

from . import transforms as T
from . import datasets as D

PIPELINES = {
    "LoadImageFromFile": T.LoadImageFromFile,
    "LoadAnnotations": T.LoadAnnotations,
    "LoadPanoAnnotations": T.LoadAnnotations,   # BFoV conversion at parse time
    "Resize": T.Resize,
    "PanoResize": T.PanoResize,
    "RandomFlip": T.RandomFlip,
    "Normalize": T.Normalize,
    "Pad": T.Pad,
    "PanoStretch": T.PanoStretch,
    "RollAug": T.RollAug,
    "PanoCheck": T.PanoCheck,
    "BasketBallExpand": T.BasketBallExpand,
    "RandomCrop": T.RandomCrop,
    "AutoAugment": T.AutoAugment,
    "PhotoMetricDistortion": T.PhotoMetricDistortion,
    "InstaBoost": T.InstaBoost,
}

DATASETS = {
    "CocoDataset": D.CocoDataset,
    "StreetDataset": D.StreetDataset,
    "Indoor360Dataset": D.Indoor360Dataset,
    "VOCDataset": D.VOCDataset,
    "LVISDataset": D.LVISDataset,
    "CityscapesDataset": D.CityscapesDataset,
    "WIDERFaceDataset": D.WIDERFaceDataset,
    "DeepFashionDataset": D.DeepFashionDataset,
}


def register_wrappers():
    from .wrappers import RepeatDataset, ConcatDataset, ClassBalancedDataset
    return {"RepeatDataset": RepeatDataset, "ConcatDataset": ConcatDataset,
            "ClassBalancedDataset": ClassBalancedDataset}


def build_pipeline(cfgs: Sequence[dict]):
    steps = []
    for c in cfgs:
        c = dict(c)
        kind = c.pop("type")
        if kind in ("DefaultFormatBundle", "Collect", "ImageToTensor",
                    "MultiScaleFlipAug"):
            continue  # collation is the loader's job in this framework
        cls = PIPELINES[kind]
        if kind == "LoadPanoAnnotations":
            c.pop("bb_tangent2sphere", None)
            c.pop("with_mask", None)
        steps.append(cls(**c))
    return steps


def build_dataset(cfg: dict):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind == "RepeatDataset":
        from .wrappers import RepeatDataset
        return RepeatDataset(build_dataset(cfg["dataset"]), cfg.get("times", 1))
    if kind == "ClassBalancedDataset":
        from .wrappers import ClassBalancedDataset
        return ClassBalancedDataset(build_dataset(cfg["dataset"]),
                                    cfg.get("oversample_thr", 1e-3))
    pipeline = cfg.pop("pipeline", None)
    if pipeline:
        cfg["pipeline"] = build_pipeline(pipeline)
    return DATASETS[kind](**cfg)
