# Mask R-CNN with GCNet context blocks ratio 1/16 (reference configs/gcnet/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(gcb=dict(ratio=0.0625),
                           stage_with_gcb=(False, True, True, True)))
