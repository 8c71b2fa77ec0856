# faster_rcnn_hrnetv2p_w40_1x_coco (reference configs/hrnet/).
_base_ = ["faster_rcnn_hrnetv2p_w32_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="HRNet", width=40),
    neck=dict(_delete_=True, type="HRFPN", in_channels=(40, 80, 160, 320),
              out_channels=256, num_outs=5),
)
