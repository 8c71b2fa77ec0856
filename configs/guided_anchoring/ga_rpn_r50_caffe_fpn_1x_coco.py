# ga_rpn_r50_caffe_fpn_1x_coco (reference configs/guided_anchoring/).
_base_ = ["ga_rpn_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_detection_caffe.py"]
model = dict(backbone=dict(style="caffe"))
