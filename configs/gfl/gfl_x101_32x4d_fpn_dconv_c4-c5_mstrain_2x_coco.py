# gfl_x101_32x4d_fpn_dconv_c4-c5_mstrain_2x_coco (reference configs/gfl/).
_base_ = ["gfl_x101_32x4d_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, False, True, True)))
