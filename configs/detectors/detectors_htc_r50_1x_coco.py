# DetectoRS-style RFP Faster R-CNN (reference configs/detectors/).
_base_ = ["../swin/faster_rcnn_swin_tiny_patch4_window7_coco.py"]
model = dict(
    type="DetectoRS",
    backbone=dict(_delete_=True, type="ResNet", depth=50,
                  out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
    rfp_steps=2,
)
