# mask_rcnn_swin_tiny ... 1x_street (reference configs/swin/): stock Swin
# Mask R-CNN on the street dataset.
_base_ = ["mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py",
          "../_base_/datasets/street_detection.py"]
classes = ("car", "crosswalk", "light", "traffic_sign", "warning_line")
model = dict(num_classes=5)
