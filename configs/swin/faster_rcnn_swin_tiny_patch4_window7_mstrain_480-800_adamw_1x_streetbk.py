# faster_rcnn_swin_tiny ... 1x_streetbk (reference configs/swin/):
# street recipe over COCO-format annotations (coco_detection base).
_base_ = ["faster_rcnn_swin_tiny_patch4_window7_coco.py"]
