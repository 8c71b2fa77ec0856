# faster_rcnn_r101_fpn_dconv_c3-c5_1x_coco (reference configs/dcn/).
_base_ = ["faster_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py"]
model = dict(backbone=dict(depth=101))
