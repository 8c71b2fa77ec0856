# libra_faster_rcnn_r101_fpn_1x_coco (reference configs/libra_rcnn/).
_base_ = ["libra_faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="ResNet", depth=101,
                           out_indices=(0, 1, 2, 3)))
