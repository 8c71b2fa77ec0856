# Reference configs/_base_/models/cascade_mask_rcnn_r50_fpn.py.
_base_ = ["faster_rcnn_r50_fpn.py"]
model = dict(type="CascadeMaskRCNN", with_mask=True)
