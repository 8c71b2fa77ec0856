# GRoIE generic RoI extraction (reference configs/groie/): every RoI pools
# from all pyramid levels, summed.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(roi_extractor="generic")
