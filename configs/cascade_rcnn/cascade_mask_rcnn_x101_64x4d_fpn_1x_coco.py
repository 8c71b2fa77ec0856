# cascade_mask_rcnn_x101_64x4d_fpn_1x_coco (reference configs/cascade_rcnn/).
_base_ = ["cascade_mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNeXt", depth=101, groups=64,
                  base_width=4, out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
