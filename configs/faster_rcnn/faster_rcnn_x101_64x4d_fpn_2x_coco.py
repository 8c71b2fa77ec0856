# faster_rcnn_x101_64x4d_fpn_2x_coco (reference configs/faster_rcnn/).
_base_ = ["faster_rcnn_x101_64x4d_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
