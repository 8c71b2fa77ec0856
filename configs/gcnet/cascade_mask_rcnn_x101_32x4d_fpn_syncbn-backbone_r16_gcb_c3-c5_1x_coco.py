# cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r16_gcb_c3-c5_1x_coco
# (reference configs/gcnet/).
_base_ = ["cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x_coco.py"]
model = dict(backbone=dict(gcb=dict(ratio=0.0625),
                           stage_with_gcb=(False, True, True, True)))
