# mask_rcnn_r101_fpn_sample1e-3_mstrain_2x_lvis_v0.5 (reference configs/lvis/).
_base_ = ["mask_rcnn_r101_fpn_sample1e-3_mstrain_1x_lvis_v1.py",
          "../_base_/schedules/schedule_2x.py"]
model = dict(num_classes=1230)
data_root = "data/lvis_v0.5/"
