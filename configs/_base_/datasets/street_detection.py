# OmnidirectionalStreetViewDataset equirect detection data config
# (reference configs/_base_/datasets/street_detection.py).
dataset_type = "StreetDataset"
data_root = "data/OmnidirectionalStreetViewDataset/equirectangular/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="PanoStretch", chance=1.0, kxy=(2.0, 2.0)),
    dict(type="RollAug", chance=1.0, clip01=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize",
         img_scale=[(480, 1333), (512, 1333), (544, 1333), (576, 1333),
                    (608, 1333), (640, 1333), (672, 1333), (704, 1333),
                    (736, 1333), (768, 1333), (800, 1333)],
         multiscale_mode="value", keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="PanoCheck"),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(800, 1333), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="PanoCheck"),
]

data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + "train.json",
               img_prefix=data_root + "JPEGImages/",
               pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "val.json",
             img_prefix=data_root + "JPEGImages/",
             pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "val.json",
              img_prefix=data_root + "JPEGImages/",
              pipeline=test_pipeline,
              test_mode=True),
)
