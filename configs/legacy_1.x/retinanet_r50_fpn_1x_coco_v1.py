# retinanet_r50_fpn_1x_coco_v1 (reference configs/legacy_1.x/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
# mmdet v1.x-compat anchor offsets
