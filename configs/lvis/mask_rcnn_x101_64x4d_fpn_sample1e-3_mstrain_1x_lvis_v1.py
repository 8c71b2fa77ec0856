# mask_rcnn_x101_64x4d_fpn_sample1e-3_mstrain_1x_lvis_v1 (reference configs/lvis/).
_base_ = ["mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNeXt", depth=101, groups=64,
                  base_width=4, out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
