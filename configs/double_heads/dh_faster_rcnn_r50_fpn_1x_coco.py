# Double-Head R-CNN (reference configs/double_heads/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(type="DoubleHeadRCNN")
