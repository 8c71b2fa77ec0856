# mask_rcnn_r101_fpn_gn-all_3x_coco (reference configs/gn/).
_base_ = ["mask_rcnn_r101_fpn_gn-all_2x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
