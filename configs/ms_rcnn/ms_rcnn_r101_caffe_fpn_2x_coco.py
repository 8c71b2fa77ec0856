# ms_rcnn_r101_caffe_fpn_2x_coco (reference configs/ms_rcnn/).
_base_ = ["ms_rcnn_r101_caffe_fpn_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
