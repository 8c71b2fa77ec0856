# faster_rcnn_r50_fpn_mdconv_c3-c5_group4_1x_coco (reference configs/dcn/).
_base_ = ["faster_rcnn_r50_fpn_mdconv_c3-c5_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2", deform_groups=4),
                           stage_with_dcn=(False, True, True, True)))
