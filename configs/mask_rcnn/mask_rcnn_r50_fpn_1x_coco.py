# Mask R-CNN R-50 (reference configs/mask_rcnn/).
_base_ = ["../swin/mask_rcnn_swin_tiny_patch4_window7_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNet", depth=50,
                  out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
)
