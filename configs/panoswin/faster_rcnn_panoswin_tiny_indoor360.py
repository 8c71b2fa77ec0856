# PanoSwin-T Faster R-CNN on 360-Indoor (BASELINE config 4; reference
# lzx/indoor360 + faster_rcnn_panoswin_fpn on the 37-class BFoV set).
_base_ = ["../_base_/models/faster_rcnn_panoswin_fpn.py",
          "../_base_/datasets/indoor360_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(backbone=dict(ape=True, drop_path_rate=0.1), num_classes=37)
