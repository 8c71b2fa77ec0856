# 360-Indoor BFoV detection data (reference lzx/indoor360 tooling;
# BFoV boxes converted to equirect xyxy at parse time).
dataset_type = "Indoor360Dataset"
data_root = "data/360indoor/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RollAug", chance=0.5, clip01=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=(512, 1024), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="PanoCheck"),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(512, 1024), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="PanoCheck"),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type, ann_file=data_root + "train.json",
               img_prefix=data_root + "images/", pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=data_root + "val.json",
             img_prefix=data_root + "images/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type, ann_file=data_root + "val.json",
              img_prefix=data_root + "images/", pipeline=test_pipeline,
              test_mode=True),
)
