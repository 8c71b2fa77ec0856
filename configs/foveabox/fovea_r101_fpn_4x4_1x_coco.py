# fovea_r101_fpn_4x4_1x_coco (reference configs/foveabox/).
_base_ = ["fovea_r50_fpn_4x4_1x_coco.py"]
model = dict(backbone=dict(depth=101))
