# reppoints_partial_minmax_r50_fpn_gn-neck+head_1x_coco (reference
# configs/reppoints/): min/max over the first 4 points only.
_base_ = ["reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py"]
model = dict(transform_method="partial_minmax")
