# vfnet_r2_101_fpn_mdconv_c3-c5_mstrain_2x_coco (reference configs/vfnet/).
_base_ = ["vfnet_r2_101_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, True, True, True)))
