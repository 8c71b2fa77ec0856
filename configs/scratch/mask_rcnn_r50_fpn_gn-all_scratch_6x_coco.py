# mask_rcnn_r50_fpn_gn-all_scratch_6x_coco (reference configs/scratch/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(bbox_head=dict(type="Shared4Conv1FCBBoxHead", norm_groups=32),
             backbone=dict(frozen_stages=-1))
lr_config = dict(step=(65, 71))
runner = dict(max_epochs=73)
