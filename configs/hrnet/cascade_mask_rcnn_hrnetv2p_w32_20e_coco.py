# cascade_mask_rcnn_hrnetv2p_w32_20e_coco (reference configs/hrnet/).
_base_ = ["../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
model = dict(
    backbone=dict(_delete_=True, type="HRNet", width=32),
    neck=dict(_delete_=True, type="HRFPN", in_channels=(32, 64, 128, 256),
              out_channels=256, num_outs=5),
)
