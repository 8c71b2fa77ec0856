# sabl_cascade_rcnn_r101_fpn_1x_coco (reference configs/sabl/).
_base_ = ["sabl_cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
