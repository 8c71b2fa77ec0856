# cascade_mask_rcnn_r50_fpn_1x_coco (reference configs/cascade_rcnn/).
_base_ = ["cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="CascadeMaskRCNN", with_mask=True,
)
