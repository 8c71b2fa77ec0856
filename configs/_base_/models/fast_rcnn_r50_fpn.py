# Reference configs/_base_/models/fast_rcnn_r50_fpn.py — RoI head only,
# proposals supplied externally.
_base_ = ["faster_rcnn_r50_fpn.py"]
model = dict(type="FastRCNN")
