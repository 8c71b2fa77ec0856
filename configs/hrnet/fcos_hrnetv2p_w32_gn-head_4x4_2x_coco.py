# fcos_hrnetv2p_w32_gn-head_4x4_2x_coco (reference configs/hrnet/).
_base_ = ["fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
