# Reference configs/_base_/models/faster_rcnn_r50_caffe_dc5.py —
# dilated-C5 single-level layout, no FPN.
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50, style="caffe", out_indices=(3,),
                  strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2)),
    neck=dict(type="Identity"),
    featmap_strides=(16,),
    anchor_strides=(16,),
    anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
    num_classes=80,
)
