# ga_rpn_r101_caffe_fpn_1x_coco (reference configs/guided_anchoring/).
_base_ = ["ga_rpn_r50_caffe_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
