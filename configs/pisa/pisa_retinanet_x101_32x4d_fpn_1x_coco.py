# pisa_retinanet_x101_32x4d_fpn_1x_coco (reference configs/pisa/).
_base_ = ["pisa_retinanet_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(depth=101, groups=32, base_width=4))
