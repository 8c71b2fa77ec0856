# retinanet_free_anchor_r101_fpn_1x_coco (reference configs/free_anchor/).
_base_ = ["retinanet_free_anchor_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
