# htc_r101_fpn_20e_coco (reference configs/htc/).
_base_ = ["htc_r101_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
