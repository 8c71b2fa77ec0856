# faster_rcnn_swin_tiny ... 1x_street (reference configs/swin/): stock
# Swin Faster R-CNN on the street dataset with BasketBallExpand TTA.
_base_ = ["faster_rcnn_swin_tiny_patch4_window7_coco.py",
          "../_base_/datasets/street_detection.py"]
classes = ("car", "crosswalk", "light", "traffic_sign", "warning_line")
model = dict(num_classes=5)
