# faster_rcnn_r50_fpn_attention_0010_1x_coco (reference configs/empirical_attention/).
_base_ = ["faster_rcnn_r50_fpn_attention_1111_1x_coco.py"]
model = dict(backbone=dict(stage_with_gcb=(False, False, True, False)))
