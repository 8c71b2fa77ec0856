# gfl_r50_fpn_mstrain_2x_coco (reference configs/gfl/).
_base_ = ["gfl_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
# mstrain-range 640-800 (reference `multiscale_mode="range"` recipes)
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
