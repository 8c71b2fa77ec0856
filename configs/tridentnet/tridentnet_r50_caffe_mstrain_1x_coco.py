# tridentnet_r50_caffe_mstrain_1x_coco (reference configs/tridentnet/).
_base_ = ["tridentnet_r50_caffe_1x_coco.py"]
# multi-scale train 640-800 (reference mstrain recipes)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize",
         img_scale=[(640, 1333), (672, 1333), (704, 1333), (736, 1333),
                    (768, 1333), (800, 1333)],
         multiscale_mode="value", keep_ratio=True),
    dict(type="Normalize", mean=[103.530, 116.280, 123.675],
         std=[1.0, 1.0, 1.0], to_rgb=False),
    dict(type="Pad", size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
