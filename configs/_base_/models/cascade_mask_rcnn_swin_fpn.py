# Reference configs/_base_/models/cascade_mask_rcnn_swin_fpn.py.
_base_ = ["faster_rcnn_swin_fpn.py"]
model = dict(type="CascadeMaskRCNN", with_mask=True)
