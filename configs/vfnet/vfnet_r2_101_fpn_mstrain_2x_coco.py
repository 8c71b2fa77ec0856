# vfnet_r2_101_fpn_mstrain_2x_coco (reference configs/vfnet/): Res2Net-101
# backbone.
_base_ = ["vfnet_r50_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="Res2Net", depth=101,
                           scales=4, base_width=26,
                           out_indices=(0, 1, 2, 3)))
