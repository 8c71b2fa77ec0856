# htc_without_semantic_r50_fpn_1x_coco (reference configs/htc/).
_base_ = ["htc_r50_fpn_1x_coco.py"]
model = dict(with_semantic=False)
