# fcos_center_r50_caffe_fpn_gn-head_1x_coco (reference configs/fcos/):
# center-sampling variant.
_base_ = ["fcos_r50_caffe_fpn_gn-head_1x_coco.py"]
model = dict(center_sampling=True, center_sample_radius=1.5)
