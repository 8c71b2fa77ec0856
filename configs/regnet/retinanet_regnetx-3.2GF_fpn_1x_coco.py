# retinanet_regnetx-3.2GF_fpn_1x_coco (reference configs/regnet/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="RegNet", arch="regnetx_3.2gf",
                  out_indices=(1, 2, 3)),
    neck=dict(in_channels=(96, 192, 432, 1008)),
)
