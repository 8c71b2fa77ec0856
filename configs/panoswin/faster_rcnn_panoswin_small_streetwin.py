# PanoSwin-S Faster R-CNN streetwin (size variant of the streetwin recipe).
_base_ = ["faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py"]
model = dict(backbone=dict(depths=(2, 2, 18, 2), drop_path_rate=0.2))
