# cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_1x_coco (reference configs/gcnet/).
_base_ = ["cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCN"),
                           stage_with_dcn=(False, True, True, True)))
