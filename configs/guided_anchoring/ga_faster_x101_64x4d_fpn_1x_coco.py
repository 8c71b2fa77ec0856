# ga_faster_x101_64x4d_fpn_1x_coco (reference configs/guided_anchoring/).
_base_ = ["ga_faster_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=64,
                           base_width=4))
