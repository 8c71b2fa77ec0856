# crpn_r50_caffe_fpn_1x_coco (reference configs/cascade_rpn/): the
# proposal-only Cascade RPN evaluation recipe.
_base_ = ["crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py"]
model = dict(backbone=dict(style="caffe"))
