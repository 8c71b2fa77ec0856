# Empirical attention (reference configs/empirical_attention/): generalized
# attention plugin in res4.  Mapped to the GCNet context-block plugin (the
# 0010 query-independent configuration, the strongest single block in the
# paper's ablation).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(gcb=dict(ratio=0.0625),
                           stage_with_gcb=(False, False, True, False)))
