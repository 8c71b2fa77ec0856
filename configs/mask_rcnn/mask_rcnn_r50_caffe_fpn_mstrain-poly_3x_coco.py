# mask_rcnn_r50_caffe_fpn_mstrain-poly_3x_coco (reference configs/mask_rcnn/).
_base_ = ["mask_rcnn_r50_caffe_fpn_mstrain-poly_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
