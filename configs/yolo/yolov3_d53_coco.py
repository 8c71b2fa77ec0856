# YOLOv3 Darknet-53 COCO (reference configs/yolo/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    _delete_=True,
    type="YOLOV3",
    backbone=dict(type="Darknet"),
    num_classes=80,
)
