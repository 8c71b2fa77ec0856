# PanoSwin-T Faster R-CNN on OmnidirectionalStreetViewDataset.
# Reference: configs/swin/faster_rcnn_panoswin_tiny_patch4_window7_
# mstrain_480800_adamw_1x_streetwin.py (win32 dev toggles dropped).
_base_ = [
    "../_base_/models/faster_rcnn_panoswin_fpn.py",
    "../_base_/datasets/street_detection.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]

classes = ("car", "crosswalk", "light", "traffic_sign", "warning_line")

model = dict(
    backbone=dict(ape=True, drop_path_rate=0.1),
    num_classes=5,
)

checkpoint_config = dict(interval=20)
# reference amplifies the 1x step schedule 30x (streetwin cfg :144-145)
lr_config = dict(step=(240, 330))
runner = dict(max_epochs=360)
