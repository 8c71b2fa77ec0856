# mask_rcnn_r50_caffe_fpn_mstrain-poly_1x_coco (reference configs/mask_rcnn/).
_base_ = ["mask_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"]
# poly_mask variant: masks decoded from polygons (poly2mask=True is
# this loader's default; recorded for reference-name parity)
