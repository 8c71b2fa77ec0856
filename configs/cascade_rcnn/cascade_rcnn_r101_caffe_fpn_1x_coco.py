# cascade_rcnn_r101_caffe_fpn_1x_coco (reference configs/cascade_rcnn/).
_base_ = ["cascade_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_detection_caffe.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNet", depth=101,
                  out_indices=(0, 1, 2, 3), style="caffe"),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
