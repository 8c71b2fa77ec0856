# mask_rcnn_x101_32x8d_fpn_mstrain-poly_3x_coco (reference configs/mask_rcnn/).
_base_ = ["mask_rcnn_x101_32x8d_fpn_mstrain-poly_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
