# fovea_r101_fpn_4x4_2x_coco (reference configs/foveabox/).
_base_ = ["fovea_r101_fpn_4x4_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
