# RetinaNet R-50 1x COCO (reference configs/retinanet/).
_base_ = ["../_base_/schedules/schedule_1x.py", "../_base_/default_runtime.py"]

model = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=50, out_indices=(1, 2, 3)),
    neck=dict(type="FPN", in_channels=(512, 1024, 2048), out_channels=256,
              num_outs=5, add_extra_convs=True),
    num_classes=80,
)

dataset_type = "CocoDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(800, 1333), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/",
               pipeline=[dict(type="LoadImageFromFile"),
                         dict(type="LoadAnnotations", with_bbox=True),
                         dict(type="RandomFlip", flip_ratio=0.5)] + pipeline[2:]),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/", pipeline=pipeline,
             test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/", pipeline=pipeline,
              test_mode=True),
)
