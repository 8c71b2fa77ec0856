# GA-RetinaNet R-50 (reference configs/guided_anchoring/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    _delete_=True,
    type="GARetinaNet",
    backbone=dict(type="ResNet", depth=50, out_indices=(1, 2, 3)),
    neck=dict(type="FPN", in_channels=(512, 1024, 2048), out_channels=256,
              num_outs=5, add_extra_convs=True,
              relu_before_extra_convs=True),
    num_classes=80,
)
