# Reference configs/_base_/models/mask_rcnn_r50_fpn.py.
_base_ = ["faster_rcnn_r50_fpn.py"]
model = dict(type="MaskRCNN", with_mask=True)
