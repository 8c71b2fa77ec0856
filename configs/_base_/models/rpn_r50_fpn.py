# Reference configs/_base_/models/rpn_r50_fpn.py — proposal-only model.
_base_ = ["faster_rcnn_r50_fpn.py"]
model = dict(type="RPN")
