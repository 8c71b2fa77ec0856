# Empirical attention (reference configs/empirical_attention/
# faster_rcnn_r50_fpn_attention_1111_1x_coco.py): GeneralizedAttention
# plugin after conv2 of res4/res5, all four energy terms.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(
    gen_attention=dict(num_heads=8, attention_type="1111", kv_stride=2,
                       spatial_range=-1),
    stage_with_gen_attention=(False, False, True, True)))
