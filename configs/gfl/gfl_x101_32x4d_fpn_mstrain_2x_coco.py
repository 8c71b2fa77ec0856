# gfl_x101_32x4d_fpn_mstrain_2x_coco (reference configs/gfl/).
_base_ = ["gfl_r50_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=32,
                           base_width=4))
