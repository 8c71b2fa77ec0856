# htc_r2_101_fpn_20e_coco (reference configs/res2net/).
_base_ = ["../htc/htc_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
model = dict(
    backbone=dict(_delete_=True, type="Res2Net", depth=101, scales=4,
                  base_width=26, out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
