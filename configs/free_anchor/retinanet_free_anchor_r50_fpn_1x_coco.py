# FreeAnchor RetinaNet R-50 (reference configs/free_anchor/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(type="FreeAnchorRetinaNet")
