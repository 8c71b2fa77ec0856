# ga_fast_r50_caffe_fpn_1x_coco (reference configs/guided_anchoring/):
# FastRCNN trained on precomputed GA-RPN proposals (proposal files
# supplied by the data pipeline, `ga_fast_rcnn` role).
_base_ = ["../cascade_rpn/crpn_fast_rcnn_r50_caffe_fpn_1x_coco.py"]
