# reppoints_moment_r50_fpn_gn-neck+head_1x_coco (reference configs/reppoints/).
_base_ = ["reppoints_moment_r50_fpn_1x_coco.py"]
# gn-neck+head variant (head GN is baked in; neck GN recorded for parity)
