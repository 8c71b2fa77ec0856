# sabl_cascade_rcnn_r50_fpn_1x_coco (reference configs/sabl/): cascade
# with SABL heads, scale_factor 1.7/1.5/1.3 per stage.
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="SABLCascadeRCNN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    num_classes=80,
    num_buckets=14,
)
