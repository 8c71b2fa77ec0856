# Nano PanoSwin Faster R-CNN — CPU-fast demo/CI variant of the streetwin
# recipe (same graph as configs/_base_/models/faster_rcnn_panoswin_fpn.py,
# scaled down so `demo/image_demo.py` and smoke tests run in seconds).
_base_ = ["faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py"]

classes = ("car", "crosswalk", "light", "traffic_sign", "warning_line")

model = dict(
    backbone=dict(
        embed_dim=24,
        depths=(1, 1, 2, 1),
        num_heads=(1, 2, 4, 8),
        window_size=7,
        drop_path_rate=0.0,
        ape=True,
    ),
    neck=dict(in_channels=(24, 48, 96, 192), out_channels=64),
    num_classes=5,
    test_cfg=dict(
        rpn=dict(nms_pre=256, max_per_img=64, iou_threshold=0.7,
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, iou_threshold=0.5, max_per_img=32),
    ),
)
