# faster_rcnn_r50_fpn_1x_voc0712_cocofmt (reference configs/pascal_voc/):
# VOC0712 converted to COCO json format, evaluated with the COCO metric.
_base_ = ["faster_rcnn_r50_fpn_1x_voc0712.py"]
data = dict(
    train=dict(type="CocoDataset"),
    val=dict(type="CocoDataset"),
    test=dict(type="CocoDataset"),
)
