# point_rend_r50_caffe_fpn_mstrain_3x_coco (reference configs/point_rend/).
_base_ = ["point_rend_r50_caffe_fpn_mstrain_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
