# mask_rcnn_regnetx-3.2GF_fpn_mdconv_c3-c5_1x_coco (reference
# configs/regnet/): modulated DCN in stages 2-4.
_base_ = ["mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, True, True, True)))
