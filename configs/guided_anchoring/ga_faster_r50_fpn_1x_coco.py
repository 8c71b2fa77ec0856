# ga_faster_r50_fpn_1x_coco (reference configs/guided_anchoring/):
# Faster R-CNN with a guided-anchor proposal stage.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    _delete_=True,
    type="GAFasterRCNN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
    num_classes=80,
)
