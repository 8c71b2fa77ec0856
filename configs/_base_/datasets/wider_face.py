# Reference configs/_base_/datasets/wider_face.py — single-class face
# boxes at SSD-300 scale.
dataset_type = "WIDERFaceDataset"
data_root = "data/WIDERFace/"
img_norm_cfg = dict(mean=[123.675, 117.28, 109.53], std=[1, 1, 1],
                    to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="PhotoMetricDistortion", brightness_delta=32,
         contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
         hue_delta=18),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=(300, 300), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(300, 300), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
]
data = dict(
    samples_per_gpu=60,
    train=dict(type="RepeatDataset", times=2,
               dataset=dict(type=dataset_type,
                            ann_file=data_root + "train.json",
                            img_prefix=data_root + "WIDER_train/",
                            pipeline=train_pipeline)),
    val=dict(type=dataset_type, ann_file=data_root + "val.json",
             img_prefix=data_root + "WIDER_val/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type, ann_file=data_root + "val.json",
              img_prefix=data_root + "WIDER_val/", pipeline=test_pipeline,
              test_mode=True),
)
