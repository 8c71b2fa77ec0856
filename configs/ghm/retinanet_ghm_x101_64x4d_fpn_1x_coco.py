# retinanet_ghm_x101_64x4d_fpn_1x_coco (reference configs/ghm/).
_base_ = ["retinanet_ghm_x101_32x4d_fpn_1x_coco.py"]
model = dict(backbone=dict(groups=64))
