# cascade_mask_rcnn_swin_base ... giou_4conv1f_adamw_3x (reference
# configs/swin/).
_base_ = ["cascade_mask_rcnn_swin_base_patch4_window7_mstrain_480-800_adamw_3x_coco.py"]
model = dict(
    bbox_head=dict(type="Shared4Conv1FCBBoxHead", norm_groups=32),
    train_cfg=dict(rcnn=dict(reg_loss="giou", reg_loss_weight=10.0)),
)
