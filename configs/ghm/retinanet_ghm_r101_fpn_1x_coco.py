# retinanet_ghm_r101_fpn_1x_coco (reference configs/ghm/).
_base_ = ["retinanet_ghm_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
