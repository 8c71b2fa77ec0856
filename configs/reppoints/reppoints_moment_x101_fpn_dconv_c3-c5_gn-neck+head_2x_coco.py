# reppoints_moment_x101_fpn_dconv_c3-c5_gn-neck+head_2x_coco (reference
# configs/reppoints/).
_base_ = ["reppoints_moment_r50_fpn_gn-neck+head_2x_coco.py"]
model = dict(backbone=dict(depth=101, groups=32, base_width=4,
                           dcn=dict(type="DCN"),
                           stage_with_dcn=(False, True, True, True)))
