# yolov3_d53_320_273e_coco (reference configs/yolo/).
_base_ = ["yolov3_d53_mstrain-416_273e_coco.py"]
# fixed 320x320 input variant
data = dict(train=dict(pipeline=[
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Resize", img_scale=(320, 320), keep_ratio=True),
    dict(type="Normalize", mean=[0.0, 0.0, 0.0], std=[255.0, 255.0, 255.0],
         to_rgb=True),
    dict(type="Pad", size_divisor=32),
]))
