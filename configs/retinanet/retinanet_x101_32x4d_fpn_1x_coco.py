# retinanet_x101_32x4d_fpn_1x_coco (reference configs/retinanet/).
_base_ = ["retinanet_x101_64x4d_fpn_1x_coco.py"]
model = dict(backbone=dict(groups=32, base_width=4))
