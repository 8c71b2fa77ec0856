# htc_x101_64x4d_fpn_16x1_20e_coco (reference configs/htc/).
_base_ = ["htc_x101_32x4d_fpn_16x1_20e_coco.py"]
model = dict(backbone=dict(groups=64))
