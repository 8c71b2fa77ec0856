# cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x_coco (reference configs/gcnet/).
_base_ = ["../cascade_rcnn/cascade_mask_rcnn_x101_32x4d_fpn_1x_coco.py"]
model = dict(backbone=dict(norm_eval=False))
