# libra_fast_rcnn_r50_fpn_1x_coco (reference configs/libra_rcnn/).
_base_ = ["libra_faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(type="FastRCNN")
