# mask_rcnn_r101_fpn_syncbn-backbone_1x_coco (reference configs/gcnet/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
# syncbn-backbone: BN stats are cross-replica by construction under
# pjit (psum'd batch stats) — graph identical, recorded for parity
model = dict(backbone=dict(_delete_=True, type="ResNet", depth=101,
                           norm_eval=False, out_indices=(0, 1, 2, 3)),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
