# ld_r101_gflv1_r101dcn_fpn_coco_2x (reference configs/ld/).
_base_ = ["ld_r50_gflv1_r101_fpn_coco_1x.py",
          "../_base_/schedules/schedule_2x.py"]
model = dict(backbone=dict(depth=101))
