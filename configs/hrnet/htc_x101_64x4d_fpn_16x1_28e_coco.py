# htc_x101_64x4d_fpn_16x1_28e_coco (reference configs/hrnet/).
_base_ = ["../htc/htc_r101_fpn_1x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=64, base_width=4, out_indices=(0, 1, 2, 3)))
lr_config = dict(step=(24, 27))
runner = dict(max_epochs=28)
