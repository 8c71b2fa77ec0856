# mask_rcnn_r50_fpn_gn-all_contrib_3x_coco (reference configs/gn/).
_base_ = ["mask_rcnn_r50_fpn_gn-all_contrib_2x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
