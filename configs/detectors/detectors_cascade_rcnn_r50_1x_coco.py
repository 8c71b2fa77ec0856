# detectors_cascade_rcnn_r50_1x_coco (reference configs/detectors/).
_base_ = ["../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(type="DetectoRS", rfp_steps=2,
             backbone=dict(_delete_=True, type="ResNet", depth=50,
                           out_indices=(0, 1, 2, 3)),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
