# Localization distillation: GFL student (reference configs/ld/).
_base_ = ["../gfl/gfl_r50_fpn_1x_coco.py"]
model = dict(
    type="LDGFL",
    backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
    neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=256,
              num_outs=5, add_extra_convs=True,
              relu_before_extra_convs=True),
)
