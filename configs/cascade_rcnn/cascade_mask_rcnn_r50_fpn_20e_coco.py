# cascade_mask_rcnn_r50_fpn_20e_coco (reference configs/cascade_rcnn/).
_base_ = ["cascade_mask_rcnn_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
