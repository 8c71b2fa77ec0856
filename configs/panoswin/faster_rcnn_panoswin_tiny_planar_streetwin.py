# Planar-mode ablation: pano-shift/sphere-bias off (stock Swin semantics;
# the reference's pano_mode=False paths).
_base_ = ["faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py"]
model = dict(backbone=dict(pano_mode=False))
