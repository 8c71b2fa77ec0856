# mask_rcnn_r50_fpn_1x_coco_v1 (reference configs/legacy_1.x/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
# mmdet v1.x-compat NMS/assigner defaults (see faster_rcnn_..._v1)
