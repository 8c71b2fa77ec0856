# grid_rcnn_x101_64x4d_fpn_gn-head_2x_coco (reference configs/grid_rcnn/).
_base_ = ["grid_rcnn_x101_32x4d_fpn_gn-head_2x_coco.py"]
model = dict(backbone=dict(groups=64))
