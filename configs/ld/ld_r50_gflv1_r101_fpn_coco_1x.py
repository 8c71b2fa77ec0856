# ld_r50_gflv1_r101_fpn_coco_1x (reference configs/ld/).
_base_ = ["ld_r18_gflv1_r101_fpn_coco_1x.py"]
model = dict(backbone=dict(depth=50),
             neck=dict(in_channels=(512, 1024, 2048)))
