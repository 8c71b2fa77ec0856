# cascade_mask_rcnn_r50_fpn_1x_coco_v1 (reference configs/legacy_1.x/).
_base_ = ["../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py"]
# mmdet v1.x-compat defaults
