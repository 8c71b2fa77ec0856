# Dynamic R-CNN (reference configs/dynamic_rcnn/): IoU threshold adapts to
# the proposal-quality distribution.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(type="DynamicRCNN", dynamic_topk=75)
