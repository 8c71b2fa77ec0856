# mask_rcnn_regnetx-3.2GF_fpn_1x_coco (reference configs/regnet/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="RegNet", arch="regnetx_3.2gf",
                  out_indices=(0, 1, 2, 3)),
    neck=dict(_delete_=True, type="FPN", in_channels=(96, 192, 432, 1008),
              out_channels=256, num_outs=5),
)
