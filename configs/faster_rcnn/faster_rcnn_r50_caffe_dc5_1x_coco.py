# faster_rcnn_r50_caffe_dc5_1x_coco (reference configs/faster_rcnn/):
# dilated-C5 single-level layout, no FPN.
_base_ = ["faster_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_detection_caffe.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNet", depth=50, style="caffe",
                  out_indices=(3,), strides=(1, 2, 2, 1),
                  dilations=(1, 1, 1, 2)),
    neck=dict(_delete_=True, type="Identity"),
    featmap_strides=(16,),
    anchor_strides=(16,),
    anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
)
