# vfnet_x101_64x4d_fpn_mstrain_2x_coco (reference configs/vfnet/).
_base_ = ["vfnet_x101_32x4d_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(groups=64))
