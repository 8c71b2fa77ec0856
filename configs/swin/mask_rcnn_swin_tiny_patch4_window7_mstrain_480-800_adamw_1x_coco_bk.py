# mask_rcnn_swin_tiny ... 1x_coco_bk (reference configs/swin/): kept-around
# near-duplicate of the 1x recipe, preserved for config-name parity.
_base_ = ["mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py"]
