# THE flagship pano recipe under its reference name (reference
# configs/swin/faster_rcnn_panoswin_tiny_patch4_window7_mstrain_480800_
# adamw_1x_streetwin.py); canonical copy lives in configs/panoswin/.
_base_ = ["../panoswin/faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py"]
