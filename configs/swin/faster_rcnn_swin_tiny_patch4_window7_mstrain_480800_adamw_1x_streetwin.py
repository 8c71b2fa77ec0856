# faster_rcnn_swin_tiny ... streetwin (reference configs/swin/): the
# streetwin recipe with the stock Swin backbone.
_base_ = ["../panoswin/faster_rcnn_panoswin_tiny_planar_streetwin.py"]
