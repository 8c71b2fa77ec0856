# faster_rcnn_r50_caffe_c4_1x_coco (reference configs/faster_rcnn/):
# neck-less C4 layout, res5 shared head + GAP (Res5BBoxHead).
_base_ = ["faster_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_detection_caffe.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNet", depth=50, style="caffe",
                  out_indices=(2,)),
    neck=dict(_delete_=True, type="Identity"),
    featmap_strides=(16,),
    anchor_strides=(16,),
    anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
    bbox_roi_size=14,
    bbox_head=dict(type="Res5BBoxHead"),
)
