# Swin-T Cascade Mask R-CNN 1x mstrain (reference configs/swin/
# cascade_mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py,
# apex fp16 -> bf16).
_base_ = ["faster_rcnn_swin_tiny_patch4_window7_coco.py",
          "../_base_/datasets/coco_instance.py"]
model = dict(type="CascadeMaskRCNN", with_mask=True,
             compute_dtype="bfloat16",
             backbone=dict(drop_path_rate=0.2))
