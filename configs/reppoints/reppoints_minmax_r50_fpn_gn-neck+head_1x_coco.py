# reppoints_minmax_r50_fpn_gn-neck+head_1x_coco (reference
# configs/reppoints/): points2bbox via min/max extremes.
_base_ = ["reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py"]
model = dict(transform_method="minmax")
