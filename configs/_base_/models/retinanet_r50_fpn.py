# Reference configs/_base_/models/retinanet_r50_fpn.py — single-stage
# focal-loss head over P3-P7.
model = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=50, out_indices=(1, 2, 3)),
    neck=dict(type="FPN", in_channels=(512, 1024, 2048), out_channels=256,
              num_outs=5, add_extra_convs=True),
    num_classes=80,
)
