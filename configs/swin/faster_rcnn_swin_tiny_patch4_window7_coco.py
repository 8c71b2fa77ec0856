# Stock Swin-T Faster R-CNN on COCO (planar model-zoo coverage).
_base_ = [
    "../_base_/models/faster_rcnn_panoswin_fpn.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]

model = dict(
    backbone=dict(_delete_=True, type="SwinTransformer", embed_dim=96,
                  depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                  window_size=7, ape=False, drop_path_rate=0.2,
                  patch_norm=True, out_indices=(0, 1, 2, 3)),
    num_classes=80,
)

dataset_type = "CocoDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=(800, 1333), keep_ratio=True),
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
    train=dict(type=dataset_type, ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/", pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/", pipeline=test_pipeline, test_mode=True),
    test=dict(type=dataset_type, ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/", pipeline=test_pipeline, test_mode=True),
)
