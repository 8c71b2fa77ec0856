# atss_r101_fpn_1x_coco (reference configs/atss/).
_base_ = ["atss_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
