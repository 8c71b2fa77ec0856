# gfl_r101_fpn_mstrain_2x_coco (reference configs/gfl/).
_base_ = ["gfl_r50_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(depth=101))
