# COCO bbox detection data (reference configs/_base_/datasets/coco_detection.py).

dataset_type = "CocoDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize",
         img_scale=[(480, 1333), (512, 1333), (544, 1333), (576, 1333),
                    (608, 1333), (640, 1333), (672, 1333), (704, 1333),
                    (736, 1333), (768, 1333), (800, 1333)],
         multiscale_mode="value", keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]

test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(800, 1333), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/", pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/", pipeline=test_pipeline,
              test_mode=True),
)
