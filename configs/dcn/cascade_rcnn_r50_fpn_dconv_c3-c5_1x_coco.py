# Cascade R-CNN with deformable conv (reference configs/dcn/).
_base_ = ["../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, True, True, True)))
