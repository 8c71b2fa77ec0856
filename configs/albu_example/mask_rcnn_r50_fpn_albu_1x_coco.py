# Augmentation-example recipe (reference configs/albu_example/ uses the
# external albumentations library; mapped to the in-tree photometric +
# geometric augmentation pipeline).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True),
    dict(type="PhotoMetricDistortion"),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=(800, 1333), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
