# Sparse R-CNN R-50 (reference configs/sparse_rcnn/).
_base_ = ["../_base_/datasets/street_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="SparseRCNN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=4),
    num_classes=80,
    num_proposals=100,
    num_stages=6,
)
