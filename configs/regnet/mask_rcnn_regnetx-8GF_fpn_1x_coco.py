# mask_rcnn_regnetx-8GF_fpn_1x_coco (reference configs/regnet/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="RegNet", arch="regnetx_8.0gf",
                  out_indices=(0, 1, 2, 3)),
    neck=dict(_delete_=True, type="FPN", in_channels=(80, 240, 720, 1920),
              out_channels=256, num_outs=5),
)
