# faster_rcnn_r50_fpn_bounded_iou_1x_coco (reference configs/faster_rcnn/):
# bounded_iou regression loss on the RCNN head (loss weight 10 per the
# reference recipe).
_base_ = ["faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(train_cfg=dict(rcnn=dict(reg_loss="bounded_iou",
                                      reg_loss_weight=10.0)))
