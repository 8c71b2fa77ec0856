# tridentnet_r50_caffe_mstrain_3x_coco (reference configs/tridentnet/).
_base_ = ["tridentnet_r50_caffe_mstrain_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
