# sabl_faster_rcnn_r50_fpn_1x_coco (reference configs/sabl/): Faster
# R-CNN with the side-aware bucketing RCNN head (BucketingBBoxCoder
# num_buckets=14, scale_factor=1.7).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="SABLFasterRCNN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    num_classes=80,
    num_buckets=14,
    scale_factor=1.7,
)
