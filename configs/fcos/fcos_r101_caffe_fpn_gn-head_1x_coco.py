# fcos_r101_caffe_fpn_gn-head_1x_coco (reference configs/fcos/).
_base_ = ["fcos_r101_fpn_1x_coco.py",
          "../_base_/datasets/coco_detection_caffe.py"]
model = dict(backbone=dict(style="caffe"))
