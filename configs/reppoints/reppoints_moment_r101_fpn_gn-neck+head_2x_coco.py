# reppoints_moment_r101_fpn_gn-neck+head_2x_coco (reference configs/reppoints/).
_base_ = ["reppoints_moment_r101_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
