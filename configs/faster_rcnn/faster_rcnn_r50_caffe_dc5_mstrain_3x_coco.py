# faster_rcnn_r50_caffe_dc5_mstrain_3x_coco (reference configs/faster_rcnn/).
_base_ = ["faster_rcnn_r50_caffe_dc5_mstrain_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
