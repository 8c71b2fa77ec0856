# faster_rcnn_r50_caffe_fpn_mstrain_90k_coco (reference configs/faster_rcnn/):
# 90k-iteration budget expressed on the epoch runner (~8 epochs at
# COCO scale with 2 img/device), lr steps at 60k/80k equivalents.
_base_ = ["faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"]
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(6, 7))
runner = dict(type="EpochBasedRunner", max_epochs=8)
