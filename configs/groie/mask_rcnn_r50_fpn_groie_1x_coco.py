# mask_rcnn_r50_fpn_groie_1x_coco (reference configs/groie/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(roi_extractor="generic")
