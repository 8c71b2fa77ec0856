# Swin-S Mask R-CNN 1x (reference swin model zoo).
_base_ = ["mask_rcnn_swin_tiny_patch4_window7_coco.py"]
model = dict(backbone=dict(depths=(2, 2, 18, 2), drop_path_rate=0.3))
