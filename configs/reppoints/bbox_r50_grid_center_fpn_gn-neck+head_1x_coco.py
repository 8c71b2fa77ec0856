# bbox_r50_grid_center_fpn_gn-neck+head_1x_coco (reference
# configs/reppoints/): grid points with the center-based init assigner.
_base_ = ["bbox_r50_grid_fpn_gn-neck+head_1x_coco.py"]
model = dict(init_assigner="point")
