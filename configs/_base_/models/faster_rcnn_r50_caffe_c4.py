# Reference configs/_base_/models/faster_rcnn_r50_caffe_c4.py — neck-less
# C4 layout: RPN on res4 (stride 16), res5 shared head + GAP.
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50, style="caffe", out_indices=(2,)),
    neck=dict(type="Identity"),
    featmap_strides=(16,),
    anchor_strides=(16,),
    anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
    bbox_roi_size=14,
    bbox_head=dict(type="Res5BBoxHead"),
    num_classes=80,
)
