# fast_rcnn_r101_fpn_2x_coco (reference configs/fast_rcnn/).
_base_ = ["fast_rcnn_r101_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
