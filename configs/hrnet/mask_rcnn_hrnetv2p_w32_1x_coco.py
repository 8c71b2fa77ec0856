# mask_rcnn_hrnetv2p_w32_1x_coco (reference configs/hrnet/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="HRNet", width=32),
    neck=dict(_delete_=True, type="HRFPN", in_channels=(32, 64, 128, 256),
              out_channels=256, num_outs=5),
)
