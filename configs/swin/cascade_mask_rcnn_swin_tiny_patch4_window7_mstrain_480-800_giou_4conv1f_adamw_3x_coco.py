# cascade_mask_rcnn_swin_tiny ... giou_4conv1f_adamw_3x (reference
# configs/swin/).
_base_ = ["cascade_mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_giou_4conv1f_adamw_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
