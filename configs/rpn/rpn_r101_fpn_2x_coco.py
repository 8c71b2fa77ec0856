# rpn_r101_fpn_2x_coco (reference configs/rpn/).
_base_ = ["rpn_r101_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
