# Reference configs/_base_/datasets/deepfashion.py — 15-class landmark
# detection set, COCO format, 750x1101 scale.
dataset_type = "DeepFashionDataset"
data_root = "data/DeepFashion/In-shop/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=(750, 1101), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(750, 1101), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/DeepFashion_segmentation_train.json",
               img_prefix=data_root + "Img/", pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/DeepFashion_segmentation_query.json",
             img_prefix=data_root + "Img/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/DeepFashion_segmentation_gallery.json",
              img_prefix=data_root + "Img/", pipeline=test_pipeline,
              test_mode=True),
)
