# HTC R-50 1x COCO (reference configs/htc/).
_base_ = ["../swin/faster_rcnn_swin_tiny_patch4_window7_coco.py"]
model = dict(
    type="HybridTaskCascade",
    backbone=dict(_delete_=True, type="ResNet", depth=50),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
    with_semantic=False,
)
