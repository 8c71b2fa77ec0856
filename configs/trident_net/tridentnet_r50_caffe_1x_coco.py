# TridentNet R-50 (reference configs/tridentnet/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="TridentFasterRCNN",
    backbone=dict(_delete_=True, type="TridentResNet", depth=50,
                  out_indices=(0, 1, 2, 3)),
)
