# retinanet_r50_caffe_fpn_1x_coco_v1 (reference configs/legacy_1.x/).
_base_ = ["retinanet_r50_fpn_1x_coco_v1.py",
          "../_base_/datasets/coco_detection_caffe.py"]
model = dict(backbone=dict(style="caffe"))
