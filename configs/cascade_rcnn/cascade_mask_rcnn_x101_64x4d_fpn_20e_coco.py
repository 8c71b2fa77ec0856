# cascade_mask_rcnn_x101_64x4d_fpn_20e_coco (reference configs/cascade_rcnn/).
_base_ = ["cascade_mask_rcnn_x101_64x4d_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
