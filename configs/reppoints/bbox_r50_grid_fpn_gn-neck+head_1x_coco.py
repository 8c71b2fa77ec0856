# bbox_r50_grid_fpn_gn-neck+head_1x_coco (reference configs/reppoints/):
# grid-point bbox representation; init stage assigned by MaxIoU over the
# base boxes.
_base_ = ["reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py"]
model = dict(transform_method="minmax", use_grid_points=True,
             init_assigner="max_iou")
