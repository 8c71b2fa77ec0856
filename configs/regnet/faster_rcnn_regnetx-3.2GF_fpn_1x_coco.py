# faster_rcnn_regnetx-3.2GF_fpn_1x_coco (reference configs/regnet/).
_base_ = ["faster_rcnn_regnetx_3.2GF_fpn_1x_coco.py"]
