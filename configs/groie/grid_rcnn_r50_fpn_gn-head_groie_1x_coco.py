# grid_rcnn_r50_fpn_gn-head_groie_1x_coco (reference configs/groie/).
_base_ = ["../grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x_coco.py"]
model = dict(roi_extractor="generic")
