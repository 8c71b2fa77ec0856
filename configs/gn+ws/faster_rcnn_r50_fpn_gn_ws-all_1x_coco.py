# Faster R-CNN GN + weight standardization (reference configs/gn+ws/).
# WS standardizes conv kernels; with GN heads this is the gn+ws recipe.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(bbox_head=dict(type="Shared4Conv1FCBBoxHead", norm_groups=32))
