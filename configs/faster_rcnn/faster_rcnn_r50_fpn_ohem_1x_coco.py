# faster_rcnn_r50_fpn_ohem_1x_coco (reference configs/faster_rcnn/):
# OHEM sampler on the RCNN stage.
_base_ = ["faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(train_cfg=dict(rcnn=dict(sampler="ohem")))
