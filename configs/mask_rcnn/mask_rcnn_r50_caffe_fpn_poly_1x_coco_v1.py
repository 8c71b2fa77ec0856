# mask_rcnn_r50_caffe_fpn_poly_1x_coco_v1 (reference configs/mask_rcnn/):
# mmdet-1.x compat recipe; polygon masks, caffe norm.
_base_ = ["mask_rcnn_r50_caffe_fpn_1x_coco.py"]
