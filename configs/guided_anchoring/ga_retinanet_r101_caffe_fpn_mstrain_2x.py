# ga_retinanet_r101_caffe_fpn_mstrain_2x (reference configs/guided_anchoring/).
_base_ = ["ga_retinanet_r101_caffe_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=[(480, 1333), (960, 1333)],
         multiscale_mode="range", keep_ratio=True),
    dict(type="Normalize", mean=[103.530, 116.280, 123.675],
         std=[1.0, 1.0, 1.0], to_rgb=False),
    dict(type="Pad", size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
