# cascade_rcnn_r50_sac_1x_coco (reference configs/detectors/).
_base_ = ["../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="ResNet", depth=50,
                           dcn=dict(type="SAC"),
                           stage_with_dcn=(False, True, True, True),
                           out_indices=(0, 1, 2, 3)),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
