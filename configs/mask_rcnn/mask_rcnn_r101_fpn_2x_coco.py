# mask_rcnn_r101_fpn_2x_coco (reference configs/mask_rcnn/).
_base_ = ["mask_rcnn_r101_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
