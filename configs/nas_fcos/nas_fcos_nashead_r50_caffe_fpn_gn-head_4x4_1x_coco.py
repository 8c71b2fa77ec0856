# nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco (reference configs/nas_fcos/).
_base_ = ["nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py"]
# NAS-searched head variant (searched tower; same cell impl)
