# Reference configs/_base_/models/faster_rcnn_r50_fpn.py — standalone
# Faster R-CNN R-50-FPN model graph (anchors/assigner/sampler/NMS defaults
# live in the detector's default train/test cfg).
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    num_classes=80,
)
