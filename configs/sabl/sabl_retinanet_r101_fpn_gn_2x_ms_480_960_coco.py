# sabl_retinanet_r101_fpn_gn_2x_ms_480_960_coco (reference configs/sabl/).
_base_ = ["sabl_retinanet_r101_fpn_gn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=[(1333, 480), (1333, 960)],
         multiscale_mode="range", keep_ratio=True),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type="Pad", size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
