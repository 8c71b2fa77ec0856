# grid_rcnn_r50_fpn_gn-head_1x_coco (reference configs/grid_rcnn/).
_base_ = ["grid_rcnn_r50_fpn_gn-head_2x_coco.py",
          "../_base_/schedules/schedule_1x.py"]
