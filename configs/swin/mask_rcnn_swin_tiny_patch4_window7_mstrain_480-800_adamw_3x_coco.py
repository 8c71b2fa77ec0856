# Swin-T Mask R-CNN 3x mstrain (reference configs/swin/mask_rcnn_swin_tiny_
# patch4_window7_mstrain_480-800_adamw_3x_coco.py).
_base_ = ["mask_rcnn_swin_tiny_patch4_window7_coco.py",
          "../_base_/datasets/coco_instance.py",
          "../_base_/schedules/schedule_3x.py"]
model = dict(backbone=dict(drop_path_rate=0.2))
