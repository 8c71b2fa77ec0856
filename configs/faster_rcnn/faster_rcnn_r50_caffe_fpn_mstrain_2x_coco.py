# faster_rcnn_r50_caffe_fpn_mstrain_2x_coco (reference configs/faster_rcnn/).
_base_ = ["faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
