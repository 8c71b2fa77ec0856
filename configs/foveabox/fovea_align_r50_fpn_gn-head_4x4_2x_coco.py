# fovea_align_r50_fpn_gn-head_4x4_2x_coco (reference configs/foveabox/):
# deformable FeatureAlign on the cls tower.
_base_ = ["fovea_r50_fpn_4x4_2x_coco.py"]
model = dict(with_deform=True)
