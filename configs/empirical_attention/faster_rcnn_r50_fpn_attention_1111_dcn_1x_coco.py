# faster_rcnn_r50_fpn_attention_1111_dcn_1x_coco (reference configs/empirical_attention/).
_base_ = ["faster_rcnn_r50_fpn_attention_1111_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCN"),
                           stage_with_dcn=(False, True, True, True)))
