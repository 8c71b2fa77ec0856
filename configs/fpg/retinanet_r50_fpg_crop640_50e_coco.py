# retinanet_r50_fpg_crop640_50e_coco (reference configs/fpg/).
_base_ = ["faster_rcnn_r50_fpg_crop640_50e_coco.py"]
model = dict(_delete_=True, type="RetinaNet",
             backbone=dict(type="ResNet", depth=50, out_indices=(1, 2, 3)),
             neck=dict(type="FPG", in_channels=(512, 1024, 2048),
                       out_channels=256, num_outs=5, stack_times=9),
             num_classes=80)
