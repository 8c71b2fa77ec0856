# fcos_r101_fpn_1x_coco (reference configs/fcos/).
_base_ = ["fcos_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
