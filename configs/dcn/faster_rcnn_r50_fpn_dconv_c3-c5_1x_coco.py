# Faster R-CNN with deformable conv in res3-res5 (reference configs/dcn/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, True, True, True)))
