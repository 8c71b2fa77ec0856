# cascade_mask_rcnn_swin_tiny ... giou_4conv1f_adamw_1x (reference
# configs/swin/): 4conv+1fc GN bbox heads with GIoU regression.
_base_ = ["cascade_mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py"]
model = dict(
    bbox_head=dict(type="Shared4Conv1FCBBoxHead", norm_groups=32),
    train_cfg=dict(rcnn=dict(reg_loss="giou", reg_loss_weight=10.0)),
)
