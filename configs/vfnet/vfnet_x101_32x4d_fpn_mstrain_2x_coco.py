# vfnet_x101_32x4d_fpn_mstrain_2x_coco (reference configs/vfnet/).
_base_ = ["vfnet_r50_fpn_mstrain_2x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=32, base_width=4, out_indices=(1, 2, 3)))
