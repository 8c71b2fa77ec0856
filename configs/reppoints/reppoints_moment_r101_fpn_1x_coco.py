# reppoints_moment_r101_fpn_1x_coco (reference configs/reppoints/).
_base_ = ["reppoints_moment_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
