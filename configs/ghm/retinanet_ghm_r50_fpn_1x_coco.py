# RetinaNet with Gradient Harmonizing Mechanism losses (reference configs/ghm/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(loss_cls=dict(type="GHMC", bins=30, momentum=0.75),
             loss_bbox=dict(type="GHMR", mu=0.02, bins=10, momentum=0.7))
