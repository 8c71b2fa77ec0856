# cascade_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco
# (reference configs/resnest/).
_base_ = ["../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNeSt", depth=50,
                  out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
# multi-scale range train 640-800 (mstrain-range recipes)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=[(640, 1333), (800, 1333)],
         multiscale_mode="range", keep_ratio=True),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type="Pad", size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
