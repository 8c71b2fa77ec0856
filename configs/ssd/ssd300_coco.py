# SSD-300 COCO (reference configs/ssd/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    _delete_=True,
    type="SSD",
    backbone=dict(type="SSDVGG"),
    num_classes=80,
    input_size=300,
)
