# cascade_mask_rcnn_r50_fpn_instaboost_4x_coco (reference configs/instaboost/).
_base_ = ["../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py"]
lr_config = dict(step=(32, 44))
runner = dict(max_epochs=48)
