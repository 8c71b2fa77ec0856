# Verbatim Windows duplicate in the reference tree ("- 副本" = "copy");
# preserved for config-name parity.
_base_ = ["faster_rcnn_swin_tiny_patch4_window7_mstrain_480800_adamw_1x_streetwin.py"]
