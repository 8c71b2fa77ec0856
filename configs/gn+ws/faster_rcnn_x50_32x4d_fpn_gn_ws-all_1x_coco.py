# faster_rcnn_x50_32x4d_fpn_gn_ws-all_1x_coco (reference configs/gn+ws/).
_base_ = ["faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNeXt", depth=50, groups=32,
                  base_width=4, out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
