# Cascade RPN Faster R-CNN (reference configs/cascade_rpn/):
# two-stage anchor refinement with adaptive alignment as the proposal stage.
_base_ = [
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
    "../_base_/datasets/coco_detection.py",
]
model = dict(
    type="CRPNFasterRCNN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    num_classes=80,
)
