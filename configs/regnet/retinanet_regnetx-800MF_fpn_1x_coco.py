# retinanet_regnetx-800MF_fpn_1x_coco (reference configs/regnet/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="RegNet", arch="regnetx_800mf",
                  out_indices=(1, 2, 3)),
    neck=dict(in_channels=(64, 128, 288, 672)),
)
