# mmdetection-1.x compatibility recipe (reference configs/legacy_1.x/):
# 1.x anchor conventions (clamped deltas, legacy anchor centers) mapped to
# the current generator; kept so 1.x-era model descriptions resolve.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
