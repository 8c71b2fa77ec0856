# Swin-S Mask R-CNN 3x mstrain (reference configs/swin/
# mask_rcnn_swin_small_patch4_window7_mstrain_480-800_adamw_3x_coco.py).
_base_ = ["mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_3x_coco.py"]
model = dict(backbone=dict(depths=(2, 2, 18, 2), drop_path_rate=0.3))
