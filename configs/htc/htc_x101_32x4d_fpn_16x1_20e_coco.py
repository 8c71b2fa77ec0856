# htc_x101_32x4d_fpn_16x1_20e_coco (reference configs/htc/).
_base_ = ["htc_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101,
                           groups=32, base_width=4, out_indices=(0, 1, 2, 3)))
data = dict(samples_per_gpu=1)
