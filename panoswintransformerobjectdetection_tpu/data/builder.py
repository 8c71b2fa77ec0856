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
    "XMLDataset": D.VOCDataset,        # generic xml_style base: pass classes=
    "LVISDataset": D.LVISDataset,
    "LVISV05Dataset": D.LVISDataset,   # class list comes from the json
    "LVISV1Dataset": D.LVISDataset,    # (handles both coco_url and file_name)
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


def build_dataset(cfg):
    """`mmdet/datasets/builder.py:53 build_dataset` semantics: wrapper
    types recurse; a list cfg or a list-valued ``ann_file`` concatenates
    (`builder.py:26 _concat_dataset`)."""
    from .wrappers import ConcatDataset
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c) for c in cfg])
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind == "ConcatDataset":
        return ConcatDataset([build_dataset(c) for c in cfg["datasets"]],
                             cfg.get("separate_eval", True))
    if kind == "RepeatDataset":
        from .wrappers import RepeatDataset
        return RepeatDataset(build_dataset(cfg["dataset"]), cfg.get("times", 1))
    if kind == "ClassBalancedDataset":
        from .wrappers import ClassBalancedDataset
        return ClassBalancedDataset(build_dataset(cfg["dataset"]),
                                    cfg.get("oversample_thr", 1e-3))
    if isinstance(cfg.get("ann_file"), (list, tuple)):
        ann_files = cfg.pop("ann_file")
        prefixes = cfg.pop("img_prefix", "")
        separate_eval = cfg.pop("separate_eval", True)
        parts = []
        for i, af in enumerate(ann_files):
            sub = dict(cfg, type=kind, ann_file=af)
            sub["img_prefix"] = (prefixes[i] if isinstance(
                prefixes, (list, tuple)) else prefixes)
            parts.append(build_dataset(sub))
        return ConcatDataset(parts, separate_eval)
    pipeline = cfg.pop("pipeline", None)
    if pipeline:
        cfg["pipeline"] = build_pipeline(pipeline)
    return DATASETS[kind](**cfg)


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int = 0,
                     num_gpus: int = 1, dist: bool = False,
                     shuffle: bool = True, seed: int = 0, **kw):
    """`mmdet/datasets/builder.py:75 build_dataloader` analogue.

    Returns a `DetDataLoader`.  Under ``dist=True`` the loader shards by
    `jax.process_index()`/`process_count()` (the DistributedGroupSampler
    role); `num_gpus` scales the per-step batch for single-process
    multi-device SPMD.
    """
    from .loader import DetDataLoader
    num_shards, shard_id = 1, 0
    if dist:
        import jax
        num_shards, shard_id = jax.process_count(), jax.process_index()
    return DetDataLoader(dataset, batch_size=samples_per_gpu * num_gpus,
                         shuffle=shuffle, seed=seed, num_shards=num_shards,
                         shard_id=shard_id, num_workers=workers_per_gpu, **kw)


def replace_ImageToTensor(pipelines):
    """`mmdet/datasets/utils.py:13`: swap ImageToTensor for
    DefaultFormatBundle in a pipeline *config* (recursing into
    MultiScaleFlipAug transforms) — used before batched inference."""
    out = []
    for p in pipelines:
        p = dict(p)
        if p.get("type") == "MultiScaleFlipAug":
            p["transforms"] = replace_ImageToTensor(p.get("transforms", []))
        elif p.get("type") == "ImageToTensor":
            p = {"type": "DefaultFormatBundle"}
        out.append(p)
    return out


def get_loading_pipeline(pipeline):
    """`mmdet/datasets/utils.py:73`: keep only the Load* steps of a
    pipeline config (for visualizing raw samples, `browse_dataset`)."""
    return [dict(p) for p in pipeline
            if str(p.get("type", "")).startswith("Load")]
