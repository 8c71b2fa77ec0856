# ga_retinanet_x101_64x4d_fpn_1x_coco (reference configs/guided_anchoring/).
_base_ = ["ga_retinanet_x101_32x4d_fpn_1x_coco.py"]
model = dict(backbone=dict(groups=64))
