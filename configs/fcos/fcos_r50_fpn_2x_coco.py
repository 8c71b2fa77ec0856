# fcos_r50_fpn_2x_coco (reference configs/fcos/).
_base_ = ["fcos_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
