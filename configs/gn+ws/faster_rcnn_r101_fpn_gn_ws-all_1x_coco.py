# faster_rcnn_r101_fpn_gn_ws-all_1x_coco (reference configs/gn+ws/).
_base_ = ["faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="ResNet", depth=101,
                           out_indices=(0, 1, 2, 3)),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
