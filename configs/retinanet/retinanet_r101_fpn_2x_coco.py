# retinanet_r101_fpn_2x_coco (reference configs/retinanet/).
_base_ = ["retinanet_r101_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
