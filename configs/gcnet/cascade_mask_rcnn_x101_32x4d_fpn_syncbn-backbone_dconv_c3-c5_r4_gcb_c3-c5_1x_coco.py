# cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_r4_gcb_c3-c5
# (reference configs/gcnet/).
_base_ = ["cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_1x_coco.py"]
model = dict(backbone=dict(gcb=dict(ratio=0.25),
                           stage_with_gcb=(False, True, True, True)))
