# HRNetV2p-W32 Faster R-CNN (reference configs/hrnet/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="HRNet", width=32),
    neck=dict(_delete_=True, type="HRFPN", in_channels=(32, 64, 128, 256),
              out_channels=256, num_outs=5),
)
