# mask_rcnn_r50_fpn_gn_ws-all_2x_coco (reference configs/gn+ws/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_2x_coco.py"]
model = dict(bbox_head=dict(type="Shared4Conv1FCBBoxHead", norm_groups=32))
