# mask_rcnn_r101_fpn_gn_ws-all_2x_coco (reference configs/gn+ws/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_2x_coco.py"]
model = dict(bbox_head=dict(type="Shared4Conv1FCBBoxHead", norm_groups=32))
model = dict(backbone=dict(_delete_=True, type="ResNet", depth=101,
                           out_indices=(0, 1, 2, 3)),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
