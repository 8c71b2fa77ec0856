# reppoints_moment_r101_fpn_dconv_c3-c5_gn-neck+head_2x_coco (reference configs/reppoints/).
_base_ = ["reppoints_moment_r101_fpn_gn-neck+head_2x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, True, True, True)))
