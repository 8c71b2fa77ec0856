# Swin-T Mask R-CNN COCO (reference configs/swin/mask_rcnn_swin_tiny_*.py).
_base_ = ["faster_rcnn_swin_tiny_patch4_window7_coco.py"]

model = dict(
    type="MaskRCNN",
    with_mask=True,
)
