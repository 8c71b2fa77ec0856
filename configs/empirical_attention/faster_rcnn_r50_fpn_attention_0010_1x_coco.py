# faster_rcnn_r50_fpn_attention_0010_1x_coco (reference
# configs/empirical_attention/): key-content-only energy term.
_base_ = ["faster_rcnn_r50_fpn_attention_1111_1x_coco.py"]
model = dict(backbone=dict(
    gen_attention=dict(num_heads=8, attention_type="0010", kv_stride=2,
                       spatial_range=-1)))
