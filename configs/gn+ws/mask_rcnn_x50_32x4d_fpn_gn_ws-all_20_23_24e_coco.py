# mask_rcnn_x50_32x4d_fpn_gn_ws-all_20_23_24e_coco (reference configs/gn+ws/).
_base_ = ["mask_rcnn_x50_32x4d_fpn_gn_ws-all_2x_coco.py",
          "../_base_/schedules/schedule_24e_20_23.py"]
