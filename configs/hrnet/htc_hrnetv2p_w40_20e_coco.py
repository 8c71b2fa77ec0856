# htc_hrnetv2p_w40_20e_coco (reference configs/hrnet/).
_base_ = ["../htc/htc_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
model = dict(
    backbone=dict(_delete_=True, type="HRNet", width=40),
    neck=dict(_delete_=True, type="HRFPN", in_channels=(40, 80, 160, 320),
              out_channels=256, num_outs=5),
)
