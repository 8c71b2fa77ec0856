# mask_rcnn_hrnetv2p_w18_2x_coco (reference configs/hrnet/).
_base_ = ["mask_rcnn_hrnetv2p_w18_1x_coco.py",
          "../_base_/schedules/schedule_2x.py"]
