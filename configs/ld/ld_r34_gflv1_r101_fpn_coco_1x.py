# ld_r34_gflv1_r101_fpn_coco_1x (reference configs/ld/).
_base_ = ["ld_r18_gflv1_r101_fpn_coco_1x.py"]
model = dict(backbone=dict(depth=34))
