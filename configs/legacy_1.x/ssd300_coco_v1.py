# ssd300_coco_v1 (reference configs/legacy_1.x/).
_base_ = ["../ssd/ssd300_coco.py"]
# mmdet v1.x-compat anchor offsets
