# fcos_hrnetv2p_w40_gn-head_mstrain_640-800_4x4_2x_coco
# (reference configs/hrnet/).
_base_ = ["fcos_hrnetv2p_w32_gn-head_4x4_2x_coco.py"]
model = dict(backbone=dict(width=40),
             neck=dict(in_channels=(40, 80, 160, 320)))
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize",
         img_scale=[(640, 1333), (672, 1333), (704, 1333), (736, 1333),
                    (768, 1333), (800, 1333)],
         multiscale_mode="value", keep_ratio=True),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type="Pad", size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
