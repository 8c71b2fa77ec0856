# Cascade R-CNN R-50 (reference configs/cascade_rcnn/).
_base_ = ["../swin/cascade_mask_rcnn_swin_small_patch4_window7_coco.py"]
model = dict(
    type="CascadeRCNN",
    backbone=dict(_delete_=True, type="ResNet", depth=50,
                  out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=(256, 512, 1024, 2048)),
    with_mask=False,
)
