# TridentNet (reference configs/tridentnet/): weight-shared multi-dilation
# trident branches on res4.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(type="TridentFasterRCNN",
             backbone=dict(_delete_=True, type="TridentResNet", depth=50,
                           num_trident_blocks=3),
             neck=dict(in_channels=(256, 512, 1024, 2048)))
