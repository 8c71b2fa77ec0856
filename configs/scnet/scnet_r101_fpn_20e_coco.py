# scnet_r101_fpn_20e_coco (reference configs/scnet/).
_base_ = ["scnet_r50_fpn_1x_coco.py",
          "../_base_/schedules/schedule_20e.py"]
model = dict(backbone=dict(_delete_=True, type="ResNet", depth=101,
                           out_indices=(0, 1, 2, 3)),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
