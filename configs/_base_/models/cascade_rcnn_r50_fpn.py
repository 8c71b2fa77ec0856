# Reference configs/_base_/models/cascade_rcnn_r50_fpn.py — 3-stage
# cascade (IoU 0.5/0.6/0.7, loss weights 1/0.5/0.25 in the detector).
_base_ = ["faster_rcnn_r50_fpn.py"]
model = dict(type="CascadeRCNN")
