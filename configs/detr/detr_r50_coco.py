# DETR R-50 COCO (reference configs/detr/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    _delete_=True,
    type="DETR",
    backbone=dict(type="ResNet", depth=50, out_indices=(3,)),
    num_classes=80,
)
