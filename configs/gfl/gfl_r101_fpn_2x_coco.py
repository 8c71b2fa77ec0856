# gfl_r101_fpn_2x_coco (reference configs/gfl/).
_base_ = ["gfl_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
model = dict(backbone=dict(depth=101))
