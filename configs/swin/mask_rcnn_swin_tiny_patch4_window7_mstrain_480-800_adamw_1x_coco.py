# mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco
# (reference configs/swin/).
_base_ = ["mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_3x_coco.py",
          "../_base_/schedules/schedule_1x.py"]
