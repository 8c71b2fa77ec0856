# CornerNet Hourglass (reference configs/cornernet/).
_base_ = ["../_base_/datasets/street_detection.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="CornerNet",
    backbone=dict(type="HourglassNet", num_stacks=2, depth=5),
    num_classes=80,
)
