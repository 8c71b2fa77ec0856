# retinanet_x101_32x4d_fpn_2x_coco (reference configs/retinanet/).
_base_ = ["retinanet_x101_32x4d_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
