# sabl_retinanet_r101_fpn_1x_coco (reference configs/sabl/).
_base_ = ["sabl_retinanet_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101))
